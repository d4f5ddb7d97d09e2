package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.TranscriptGen
import graft.query.SearchEngine

/** Deliberate build cancellation (reference `GET /api/stopIndexing`,
  * ApiController.java:33-37): cancelling between waves must keep every
  * committed wave in the manifest, and rerunning the same build must
  * resume WITHOUT recomputing the committed shards (the resume half is
  * also pinned by EngineParitySpec). */
class BuildCancelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val corpus = TranscriptGen.corpus(seed = 13L, nConvs = 120)

  test("cancel before wave 2: wave-1 shards committed; rerun resumes and completes") {
    val root = SparkTestBase.tmpDir("graft-cancel")
    val ds = spark.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[graft.model.Turn])
    // cancelCheck is consulted once per wave: pass wave 0, stop wave 1
    var checks = 0
    val cancelAfterFirstWave = () => { checks += 1; checks > 1 }
    val e = intercept[IndexBuilder.BuildCancelledException] {
      IndexBuilder.build(spark, ds, root, shards = 8, waveSize = 2,
        maxChunkPostings = 64, cancelCheck = cancelAfterFirstWave)
    }
    assert(e.getMessage.contains("cancelled before wave 1"))

    // the wave-0 commit survived: exactly the first wave's shards
    val m = IndexManifest.read(root).get
    assert(m.completedShards == Set(0, 1),
      s"expected wave-0 shards {0,1}, got ${m.completedShards}")
    val wave0Entries = m.shards.sortBy(_.shard)

    // resume: completes the remaining waves without touching wave 0
    val resumed = IndexBuilder.build(spark, ds, root, shards = 8,
      waveSize = 2, maxChunkPostings = 64)
    assert(resumed.manifest.completedShards == (0 until 8).toSet)
    val after = resumed.manifest.shards.filter(s => Set(0, 1)(s.shard)).sortBy(_.shard)
    assert(after == wave0Entries, "committed wave recomputed on resume")

    // the resumed index answers queries (smoke: planted rare term)
    val hits = SearchEngine.query(spark, root, "needlerare", "AND", 10)
    assert(hits.nonEmpty)
  }

  test("uncancelled build with a cancelCheck never fires it spuriously") {
    val root = SparkTestBase.tmpDir("graft-cancel-noop")
    val ds = spark.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[graft.model.Turn])
    val built = IndexBuilder.build(spark, ds, root, shards = 4, waveSize = 2,
      maxChunkPostings = 64, cancelCheck = () => false)
    assert(built.manifest.completedShards == (0 until 4).toSet)
  }
}
