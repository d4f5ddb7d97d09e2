package graft.engine

import org.apache.spark.sql.SparkSession

import graft.fixtures.TranscriptGen
import graft.index.IndexBuilder
import graft.query.SearchEngine

/** Forked-JVM probe for VERDICT r03 item 5: the aligned-postings cache
  * (and every other per-root memo) must not serve plans bound to a
  * STOPPED SparkContext after the serving process stops and recreates
  * its session. Runs: build → query (populates the cache) → stop the
  * session → new session → query again. The second query hits the cache
  * entry keyed (root, snapshotId) whose DataFrame belongs to the dead
  * context; the liveness check must rebuild instead of failing. Prints
  * RELIFE_OK on success. (Must run in its own JVM: the test suites share
  * one SparkSession that cannot be stopped mid-run.) */
object SessionRelifeProbe {
  private def session(): SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-relife")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.host", "localhost")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val s1 = session()
    s1.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-relife").toString
    val corpus = TranscriptGen.corpus(seed = 5L, nConvs = 40)
    IndexBuilder.build(s1, s1.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[graft.model.Turn]), root,
      shards = 4, waveSize = 4, maxChunkPostings = 64)
    val r1 = SearchEngine.query(s1, root, "needlemid w0000", "AND", 10)
    require(r1.nonEmpty, "probe query returned nothing")
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val s2 = session()
    s2.sparkContext.setLogLevel("WARN")
    // same root, same snapshot id → the cached aligned plan from s1's
    // dead context is the hit; liveness validation must rebuild it
    val r2 = SearchEngine.query(s2, root, "needlemid w0000", "AND", 10)
    require(r1 == r2, s"post-relife query diverged: $r1 vs $r2")
    println("RELIFE_OK")
    s2.stop()
  }
}
