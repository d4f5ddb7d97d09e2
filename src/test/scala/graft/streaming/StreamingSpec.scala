package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming semantics pinned against batch equivalents: the SAME
  * transformation over `readStream` (file source, AvailableNow) must
  * equal the batch run / scalar oracle on identical input. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val eventsDir: String = {
    // isolate the events table in its own dir (file stream sources read
    // whole directories)
    val dir = SparkTestBase.tmpDir("graft-events")
    // testdata ts is TIMESTAMP_NTZ; event-time watermarks require
    // TIMESTAMP (session tz = UTC, values identical)
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", $"ts".cast("timestamp"))
    src.write.mode("overwrite").parquet(s"$dir/in")
    s"$dir/in"
  }

  private def eventsSchema = spark.read.parquet(eventsDir).schema

  test("streaming hourly counts == batch hourly counts (file source, AvailableNow)") {
    val streamIn = spark.readStream.schema(eventsSchema).parquet(eventsDir)
    val agg = StreamingJobs.hourlyTypeCounts(streamIn)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("hourly_out")
      .option("checkpointLocation", SparkTestBase.tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("hourly_out")
      .orderBy($"hour", $"event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val expected = StreamingJobs.hourlyTypeCounts(spark.read.parquet(eventsDir))
      .orderBy($"hour", $"event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    // append-mode emits only windows the watermark closed; every emitted
    // row must match batch, and most windows must have been emitted
    // (AvailableNow advances the watermark past the last event)
    assert(got.nonEmpty)
    val expectedMap = expected.map(e => (e._1, e._2) -> e._3).toMap
    got.foreach { g =>
      assert(expectedMap.get((g._1, g._2)).contains(g._3), s"row $g")
    }
    assert(got.length >= expected.length - 5, // tail windows may stay open
      s"streaming emitted ${got.length} of ${expected.length} windows")
  }

  test("stateful sessionization == scalar batch oracle") {
    val raw = spark.read.parquet(eventsDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[StreamingJobs.Event].collect().toSeq

    val streamIn = spark.readStream.schema(eventsSchema).parquet(eventsDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[StreamingJobs.Event]
    val q = StreamingJobs.sessionize(streamIn)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation", SparkTestBase.tmpDir("graft-ckpt2"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    val got = spark.table("sessions_out")
      .orderBy($"user_id", $"start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    val expected = StreamingJobs.sessionizeBatchOracle(raw)
      .map(s => (s.user_id, s.start, s.end, s.n_events))

    // sessions emitted by the stream must be exactly correct; sessions
    // still open at end-of-stream are not emitted in append mode
    val expectedSet = expected.toSet
    got.foreach(g => assert(expectedSet.contains(g), s"session $g"))
    assert(got.length >= expected.size / 2,
      s"only ${got.length} of ${expected.size} sessions emitted")
  }

  test("streaming index ingestion: micro-batch appends, queries see new docs") {
    import graft.index.IndexBuilder
    import graft.model.Turn
    import graft.query.SearchEngine
    val ts0 = new java.sql.Timestamp(1700000000000L)
    val base = graft.fixtures.TranscriptGen.corpus(seed = 55L, nConvs = 60)
    val root = SparkTestBase.tmpDir("graft-stream-idx")
    IndexBuilder.build(spark, spark.createDataset(base), root,
      shards = 4, waveSize = 4, maxChunkPostings = 64)

    // a file-source stream of NEW turns, including an out-of-order conv
    val inDir = SparkTestBase.tmpDir("graft-stream-turns")
    val newTurns = Seq(
      Turn("conv-zzz00001", 0, "user", "zzstreamed fresh needle", "", ts0),
      Turn("conv-zzz00001", 1, "assistant", "zzstreamed again", "", ts0),
      Turn("conv-00000000a", 0, "user", "zzstreamed backfill conv", "", ts0))
    spark.createDataset(newTurns).write.parquet(s"$inDir/b0")
    val streamIn = spark.readStream
      .schema(spark.createDataset(newTurns).schema)
      .parquet(s"$inDir/*")
      .as[Turn]
    val q = StreamingJobs.indexIngest(streamIn, root,
      SparkTestBase.tmpDir("graft-stream-ckpt")) // AvailableNow: self-terminates
    q.awaitTermination(120000)
    q.stop()

    val hits = SearchEngine.query(spark, root, "zzstreamed", "OR", 10)
    assert(hits.size == 3, s"streamed docs not searchable: $hits")
    // pre-existing content still rank-correct after the streamed appends
    val oracleDocs = IndexBuilder.loadDocs(spark, root).count()
    assert(oracleDocs == base.size + 3)
  }

  test("ingest replay of a fully committed batch is skipped idempotently") {
    import graft.index.{IndexBuilder, IndexManifest}
    import graft.model.Turn
    import graft.query.SearchEngine
    val ts0 = new java.sql.Timestamp(1700000000000L)
    val base = graft.fixtures.TranscriptGen.corpus(seed = 56L, nConvs = 40)
    val root = SparkTestBase.tmpDir("graft-replay-idx")
    IndexBuilder.build(spark, spark.createDataset(base), root,
      shards = 4, waveSize = 4, maxChunkPostings = 64)
    val inDir = SparkTestBase.tmpDir("graft-replay-turns")
    val batch = Seq(
      Turn("conv-zzz10001", 0, "user", "zzreplayed needle", "", ts0),
      Turn("conv-zzz10001", 1, "assistant", "zzreplayed again", "", ts0))
    spark.createDataset(batch).write.parquet(s"$inDir/b0")
    def ingestOnce(): Unit = {
      val in = spark.readStream
        .schema(spark.createDataset(batch).schema).parquet(s"$inDir/*").as[Turn]
      // FRESH checkpoint each call — the second run replays the batch the
      // first one already committed (the crash-between-commit-and-
      // checkpoint shape)
      val q = StreamingJobs.indexIngest(in, root,
        SparkTestBase.tmpDir("graft-replay-ckpt"))
      q.awaitTermination(120000); q.stop()
    }
    ingestOnce()
    val m1 = IndexManifest.read(root).get
    ingestOnce() // replay: keys exist AND manifest covers docs → skip
    val m2 = IndexManifest.read(root).get
    assert(m2.nDocs == m1.nDocs, "replay must not double-index")
    assert(m2.snapshotId == m1.snapshotId, "replay must not commit")
    assert(SearchEngine.query(spark, root, "zzreplayed", "OR", 10).size == 2)
  }

  test("crashed partial append: orphan generation invisible; replay re-appends cleanly") {
    import graft.index.{IndexBuilder, IndexManifest}
    import graft.model.Turn
    import graft.query.SearchEngine
    val ts0 = new java.sql.Timestamp(1700000000000L)
    val base = graft.fixtures.TranscriptGen.corpus(seed = 57L, nConvs = 40)
    val root = SparkTestBase.tmpDir("graft-partial-idx")
    IndexBuilder.build(spark, spark.createDataset(base), root,
      shards = 4, waveSize = 4, maxChunkPostings = 64)
    val m = IndexManifest.read(root).get
    val maxDoc = IndexBuilder.loadDocs(spark, root)
      .agg(max($"docId")).head().getLong(0)
    // simulate an append that crashed between the docs write and the
    // manifest commit: under the copy-on-write snapshot layout the
    // batch's doc rows land in the UNCOMMITTED generation dir
    // docs/gen=<snapshotId+1> that no manifest references (ADVICE r03
    // item 1 — the r03 flat layout made these rows visible orphans that
    // could silently re-assign docIds)
    val orphan = Seq(
      Turn("conv-zzz20001", 0, "user", "zzorphan needle", "", ts0),
      Turn("conv-zzz20001", 1, "user", "zzorphan two", "", ts0))
    val orphanRows = orphan.zipWithIndex.map { case (t, i) =>
      (maxDoc + 1 + i, t.conv_id, t.turn_idx, t.role, t.text, t.tool,
        graft.analysis.Analyzer.tokens(t.text).length,
        m.shards.map(_.shard).max + 1)
    }.toDF("docId", "conv_id", "turn_idx", "role", "text", "tool", "dl", "shard")
    orphanRows.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$root/docs/gen=${m.snapshotId + 1}")

    // orphans are invisible to every reader
    assert(IndexBuilder.loadDocs(spark, root).count() == m.nDocs)
    assert(SearchEngine.query(spark, root, "zzorphan", "OR", 10).isEmpty)

    // resuming ingest replays the same batch: the keys are NOT in the
    // committed snapshot, so the append re-runs normally into its OWN
    // fresh generation (the orphan stays unreferenced until the orphan-
    // grace sweep) — no duplicate docIds, no manual cleanup
    val inDir = SparkTestBase.tmpDir("graft-partial-turns")
    spark.createDataset(orphan).write.parquet(s"$inDir/b0")
    val in = spark.readStream
      .schema(spark.createDataset(orphan).schema).parquet(s"$inDir/*").as[Turn]
    val q = StreamingJobs.indexIngest(in, root,
      SparkTestBase.tmpDir("graft-partial-ckpt"))
    q.awaitTermination(120000); q.stop()
    val m2 = IndexManifest.read(root).get
    assert(m2.nDocs == m.nDocs + 2)
    assert(SearchEngine.query(spark, root, "zzorphan", "OR", 10).size == 2)
    val docs = IndexBuilder.loadDocs(spark, root)
    assert(docs.select($"docId").distinct().count() == m.nDocs + 2,
      "docIds must stay unique after replaying over a crashed append")
  }

  test("ingestion dedup: fingerprint dedup across micro-batches, watermark-bounded state") {
    import graft.model.Turn
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val inDir = SparkTestBase.tmpDir("graft-dedupin")
    val b0 = Seq(
      Turn("c1", 0, "user", "alpha beta gamma", "", ts(0)),
      // case/whitespace variant — same ANALYZED fingerprint
      Turn("c1", 1, "user", "ALPHA   beta GAMMA", "", ts(1)),
      Turn("c2", 0, "user", "unique text one", "", ts(2)))
    val b1 = Seq(
      Turn("c3", 0, "user", "alpha beta gamma", "", ts(3)), // dup across batches
      Turn("c4", 0, "user", "unique text two", "", ts(4)))
    spark.createDataset(b0).write.parquet(s"$inDir/b0")
    spark.createDataset(b1).write.parquet(s"$inDir/b1")
    val streamIn = spark.readStream
      .schema(spark.createDataset(b0).schema).parquet(s"$inDir/*").as[Turn]
    val outDir = SparkTestBase.tmpDir("graft-dedupout")
    val q = StreamingJobs.dedupIngest(streamIn)
      .writeStream
      .option("checkpointLocation", SparkTestBase.tmpDir("graft-dedupckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", outDir)
      .start()
    q.awaitTermination(120000)
    q.stop()
    val got = spark.read.parquet(outDir).as[Turn].collect()
    assert(got.length == 3, s"expected 3 survivors, got ${got.toSeq}")
    assert(got.count(_.text.toLowerCase.startsWith("alpha")) == 1,
      "exactly one of the three same-fingerprint variants survives")
    assert(got.exists(_.text == "unique text one"))
    assert(got.exists(_.text == "unique text two"))
    // same transform on a BATCH frame (unified API)
    val batchGot = StreamingJobs.dedupIngest(
      spark.createDataset(b0 ++ b1)).collect()
    assert(batchGot.length == 3)
  }

  test("composed pipeline: dedupIngest -> indexIngest, dedup survivors indexed once") {
    import graft.index.IndexBuilder
    import graft.model.Turn
    import graft.query.SearchEngine
    val ts0 = new java.sql.Timestamp(1700000000000L)
    val base = graft.fixtures.TranscriptGen.corpus(seed = 77L, nConvs = 40)
    val root = SparkTestBase.tmpDir("graft-composed-idx")
    IndexBuilder.build(spark, spark.createDataset(base), root,
      shards = 4, waveSize = 4, maxChunkPostings = 64)

    val inDir = SparkTestBase.tmpDir("graft-composed-in")
    val newTurns = Seq(
      Turn("conv-zz1", 0, "user", "zzcomposed fresh needle", "", ts0),
      Turn("conv-zz2", 0, "user", "ZZCOMPOSED   fresh NEEDLE", "", ts0), // dup fp
      Turn("conv-zz3", 0, "user", "zzcomposed different entirely", "", ts0),
      Turn("conv-zz4", 0, "user", "", "", ts0)) // zero-token: passes through
    spark.createDataset(newTurns).write.parquet(s"$inDir/b0")
    val streamIn = spark.readStream
      .schema(spark.createDataset(newTurns).schema).parquet(s"$inDir/*")
      .as[Turn]
    // the advertised composition: watermarked fingerprint dedup feeding
    // the micro-batch index appender (the localCheckpoint pin inside
    // appendConversationsDs is what makes the nondeterministic
    // dropDuplicates survivor safe to assign docIds to)
    val q = StreamingJobs.indexIngest(
      StreamingJobs.dedupIngest(streamIn), root,
      SparkTestBase.tmpDir("graft-composed-ckpt"))
    q.awaitTermination(120000)
    q.stop()

    // exactly ONE of the two same-fingerprint variants got indexed
    val hits = SearchEngine.query(spark, root, "zzcomposed", "OR", 10)
    assert(hits.size == 2, s"expected dedup to 2 zzcomposed docs: $hits")
    // 3 survivors total (2 distinct fingerprints + 1 zero-token turn)
    assert(IndexBuilder.loadDocs(spark, root).count() == base.size + 3)
  }

  test("sliding windows produce overlapping coverage") {
    val out = StreamingJobs.slidingRates(spark.read.parquet(eventsDir))
      .orderBy($"w_start").collect()
    assert(out.length > 3)
    // 30-min windows every 10 min: each event lands in 3 windows
    val total = out.map(_.getLong(2)).sum
    val n = spark.read.parquet(eventsDir).count()
    assert(total == 3 * n, s"sliding coverage $total != 3×$n")
  }
}
