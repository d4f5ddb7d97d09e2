package graft.cli

import java.nio.file.Files
import java.util.Locale

import org.apache.spark.sql.SparkSession

import graft.fixtures.TranscriptGen
import graft.index.IndexBuilder
import graft.query.SearchEngine

/** r8 optimization-round evidence bench (separate from the FROZEN
  * graft.Bench): measures the SHOULD-walk dispatch/pruning work of this
  * round on a 20k-conv index — hot-term SHOULD queries against the
  * equivalent plain OR (VERDICT r7 item 1 done-criterion: hot-term
  * SHOULD at <= ~1.2x the equivalent OR top-k).
  *
  *   sbt "runMain graft.cli.BenchExtra [nConvs] [reps]"
  */
object BenchExtra {
  private def fmt(d: Double): String = "%.4f".formatLocal(Locale.ROOT, d)

  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(20000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(8, Runtime.getRuntime.availableProcessors()).toString).toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-bench-extra").toString
    IndexBuilder.build(s,
      TranscriptGen.dataset(s, seed = 7L, nConvs = nConvs, partitions = cpus),
      root, shards = cpus, waveSize = 64)

    def best(f: => Unit): Double = {
      f // warm
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val hot2 = "w0000 w0001" // the two hottest Zipf terms
    val hot3 = "w0000 w0001 w0002"
    val or2 = best { SearchEngine.query(s, root, hot2, "OR", 10); () }
    val should2m1 = best { SearchEngine.queryShould(s, root, hot2, 1, 10); () }
    val or3 = best { SearchEngine.query(s, root, hot3, "OR", 10); () }
    val should3m1 = best { SearchEngine.queryShould(s, root, hot3, 1, 10); () }
    val should3m2 = best { SearchEngine.queryShould(s, root, hot3, 2, 10); () }
    // sanity: the dispatch law (minMatch=1 == OR) must hold bit-equal
    val lawOk =
      SearchEngine.queryShould(s, root, hot3, 1, 10) ==
        SearchEngine.query(s, root, hot3, "OR", 10)
    println(s"""{"bench":"should_vs_or","n_convs":$nConvs,"reps":$reps,""" +
      s""""or2_sec":${fmt(or2)},"should2_m1_sec":${fmt(should2m1)},""" +
      s""""or3_sec":${fmt(or3)},"should3_m1_sec":${fmt(should3m1)},""" +
      s""""should3_m2_sec":${fmt(should3m2)},""" +
      s""""ratio_m1_vs_or":${fmt(should3m1 / or3)},""" +
      s""""ratio_m2_vs_or":${fmt(should3m2 / or3)},""" +
      s""""law_minmatch1_eq_or":$lawOk}""")
    try graft.Bench.deleteRecursively(root)
    catch { case _: Exception => () }
    s.stop()
  }
}
