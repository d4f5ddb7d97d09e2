package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.TranscriptGen
import graft.query.SearchEngine

/** Manifest resolution at serving scale (VERDICT r04 items 1 + 4):
  *
  *  - memoized resolution: repeat queries on an unchanged snapshot pay
  *    ONE manifest read and ZERO directory listings (the version-hint
  *    file replaces the LIST; the (root, version) memo replaces the
  *    re-parse) — counter-proven, the `lastKeyCheckShards` observability
  *    pattern;
  *  - the hint is ADVISORY: stale/missing/garbled hints are corrected by
  *    the forward existence probe or the listing fallback, then
  *    self-healed;
  *  - sidecar layout: big manifests store shard entries in a binary
  *    sidecar (Iceberg manifest-list split) — byte-exact roundtrip, CAS
  *    semantics unchanged, a synthetic 100k-entry manifest resolves in
  *    milliseconds, expire reclaims sidecars with their manifests.
  */
class IndexManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def mkManifest(id: Long, entries: Seq[ShardEntry]): Manifest =
    Manifest(id, "graft-analyzer-1", s"$id-42", nDocs = 100L * id,
      avgdl = 19.5, shards = entries, statsGen = 7L, sumDl = 1950L * id)

  private def mkEntries(n: Int): Seq[ShardEntry] =
    (0 until n).map { i =>
      ShardEntry(i, terms = 1000L + i, postings = 50000L + i,
        bytes = 123456L + i, sourcePartitions = Seq(i, i + n),
        minDocId = i * 4096L, maxDocId = i * 4096L + 4095L,
        sumDl = 80000L + i, gen = if (i % 3 == 0) 0L else 77L,
        minConv = Some(f"conv-$i%08d"), maxConv = Some(f"conv-$i%08d-zz"))
    }

  private def hintFile(root: String) = new java.io.File(root, "version-hint.text")

  /** Overwrite the hint through the Hadoop fs (keeps the .crc sidecar in
    * sync — a raw java.nio write would turn every later read into a
    * ChecksumException, testing the IO-failure path instead). */
  private def writeHintRaw(root: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(root, "version-hint.text"), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  test("readCached: 1 manifest read + 0 listings for N repeat resolutions") {
    val root = SparkTestBase.tmpDir("graft-manifest-memo")
    IndexManifest.commit(root, mkManifest(1, mkEntries(8)))
    IndexManifest.invalidateCache(root)
    assert(hintFile(root).exists(), "commit must write the version hint")

    val reads0 = IndexManifest.manifestReads.get()
    val lists0 = IndexManifest.manifestListings.get()
    val got = (1 to 5).map(_ => IndexManifest.readCached(root).get)
    assert(got.forall(_ == got.head))
    assert(got.head.snapshotId == 1L)
    assert(IndexManifest.manifestReads.get() - reads0 == 1L,
      "exactly one full manifest read+parse across 5 resolutions")
    assert(IndexManifest.manifestListings.get() - lists0 == 0L,
      "zero directory listings on the hinted path")
    // the memo serves the SAME content a cold parse would
    assert(got.head == IndexManifest.readVersion(root, 1L))
  }

  test("readCached: stale hint corrected by the forward probe, no listing") {
    val root = SparkTestBase.tmpDir("graft-manifest-stale")
    IndexManifest.commit(root, mkManifest(1, mkEntries(4)))
    IndexManifest.commit(root, mkManifest(2, mkEntries(4)), expectNew = true)
    // simulate a crashed hint write: the hint still names v1
    writeHintRaw(root, "1")
    IndexManifest.invalidateCache(root)
    val lists0 = IndexManifest.manifestListings.get()
    val m = IndexManifest.readCached(root).get
    assert(m.snapshotId == 2L, "forward probe must find the newer version")
    assert(IndexManifest.manifestListings.get() - lists0 == 0L)
    // and the hint self-healed, so the next resolution probes from v2
    assert(new String(java.nio.file.Files.readAllBytes(hintFile(root).toPath))
      .trim == "2")
  }

  test("readCached: missing hint falls back to ONE listing, then self-heals") {
    val root = SparkTestBase.tmpDir("graft-manifest-nohint")
    IndexManifest.commit(root, mkManifest(1, mkEntries(4)))
    assert(hintFile(root).delete())
    IndexManifest.invalidateCache(root)
    val lists0 = IndexManifest.manifestListings.get()
    assert(IndexManifest.readCached(root).get.snapshotId == 1L)
    assert(IndexManifest.manifestListings.get() - lists0 == 1L,
      "no hint → exactly one listing")
    assert(hintFile(root).exists(), "fallback must rewrite the hint")
    val lists1 = IndexManifest.manifestListings.get()
    assert(IndexManifest.readCached(root).get.snapshotId == 1L)
    assert(IndexManifest.manifestListings.get() - lists1 == 0L,
      "self-healed hint → no further listings")
  }

  test("garbled hint is advisory only: resolution falls back and heals") {
    val root = SparkTestBase.tmpDir("graft-manifest-garbled")
    IndexManifest.commit(root, mkManifest(1, mkEntries(2)))
    writeHintRaw(root, "not-a-number")
    IndexManifest.invalidateCache(root)
    assert(IndexManifest.readCached(root).get.snapshotId == 1L)
  }

  test("sidecar: small-manifest roundtrip is byte-exact vs inline layout") {
    val rootInline = SparkTestBase.tmpDir("graft-manifest-inline")
    val rootSide = SparkTestBase.tmpDir("graft-manifest-side")
    // entries exercising every field shape: empty sourcePartitions,
    // absent conv bounds, unicode conv ids, empty shard list edge
    val entries = Seq(
      ShardEntry(0, 10L, 20L, 30L, Seq.empty, -1L, -1L, 0L, 0L, None, None),
      ShardEntry(3, 1L, 2L, 3L, Seq(1, 2, 3), 0L, 99L, 500L, 42L,
        Some("conv-ё-\"quoted\"\nline"), Some("conv-😀-hi")),
      ShardEntry(7, 0L, 0L, 0L, Seq(7), -1L, -1L, 0L, 9L, None, None))
    val m = mkManifest(1, entries)
    IndexManifest.commit(rootInline, m)
    IndexManifest.sidecarThresholdOverride = Some(1)
    try IndexManifest.commit(rootSide, m)
    finally IndexManifest.sidecarThresholdOverride = None
    val sidecars = new java.io.File(rootSide).list()
      .filter(_.endsWith(".entries"))
    assert(sidecars.length == 1, s"expected one sidecar: ${sidecars.toSeq}")
    IndexManifest.invalidateCache(rootInline)
    IndexManifest.invalidateCache(rootSide)
    val a = IndexManifest.readVersion(rootInline, 1L)
    val b = IndexManifest.readVersion(rootSide, 1L)
    assert(a == b, "sidecar and inline layouts must parse identically")
    assert(b.shards.sortBy(_.shard) == entries.sortBy(_.shard))
  }

  test("sidecar: 100k-entry manifest commits and resolves in milliseconds") {
    val root = SparkTestBase.tmpDir("graft-manifest-100k")
    val entries = mkEntries(100000)
    val t0 = System.nanoTime()
    IndexManifest.commit(root, mkManifest(1, entries)) // > threshold → sidecar
    val commitMs = (System.nanoTime() - t0) / 1e6
    assert(new java.io.File(root).list().exists(_.endsWith(".entries")),
      "100k entries must take the sidecar layout")
    // cold parse timing, best of 3 (shared-host noise)
    val reps = (1 to 3).map { _ =>
      IndexManifest.invalidateCache(root)
      val t = System.nanoTime()
      val m = IndexManifest.readVersion(root, 1L)
      val ms = (System.nanoTime() - t) / 1e6
      assert(m.shards.size == 100000)
      ms
    }
    info(f"100k-entry manifest: commit ${commitMs}%.0f ms, " +
      f"cold reads ${reps.map(r => f"$r%.0f").mkString("/")} ms")
    assert(reps.min < 2000.0,
      f"100k-entry resolution took ${reps.min}%.0f ms — sidecar parse " +
      "should be tens of milliseconds")
    // spot-check full fidelity at both ends of the entry range
    val m = IndexManifest.readVersion(root, 1L)
    assert(m.shards.head == entries.head)
    assert(m.shards.last == entries.last)
    assert(m.shards(54321) == entries(54321))
  }

  test("sidecar: expire reclaims sidecars with their manifests; retained stay readable") {
    val root = SparkTestBase.tmpDir("graft-manifest-expire")
    IndexManifest.sidecarThresholdOverride = Some(1)
    try {
      IndexManifest.commit(root, mkManifest(1, mkEntries(3)))
      IndexManifest.commit(root, mkManifest(2, mkEntries(3)), expectNew = true)
      IndexManifest.commit(root, mkManifest(3, mkEntries(3)), expectNew = true)
      assert(new java.io.File(root).list().count(_.endsWith(".entries")) == 3)
      IndexSnapshot.expireSnapshots(spark, root, keepLast = 2)
      assert(IndexManifest.versions(root) == Seq(2L, 3L))
      assert(new java.io.File(root).list().count(_.endsWith(".entries")) == 2,
        "expired manifest's sidecar must be reclaimed")
      IndexManifest.invalidateCache(root)
      assert(IndexManifest.readVersion(root, 2L).shards.size == 3)
      assert(IndexManifest.readVersion(root, 3L).shards.size == 3)
    } finally IndexManifest.sidecarThresholdOverride = None
  }

  test("sidecar layout survives a real maintenance chain (build → delete → append → queries)") {
    // force every commit through the sidecar path and run actual ops —
    // proves the layout is a pure representation change, invisible to
    // builder, maintenance and query semantics alike
    val root = SparkTestBase.tmpDir("graft-sidecar-chain")
    val corpus = TranscriptGen.corpus(seed = 41L, nConvs = 80)
    IndexManifest.sidecarThresholdOverride = Some(1)
    try {
      IndexBuilder.build(spark, spark.createDataset(corpus)(
        org.apache.spark.sql.Encoders.product[graft.model.Turn]), root,
        shards = 4, waveSize = 4)
      assert(new java.io.File(root).list().exists(_.endsWith(".entries")))
      val before = SearchEngine.query(spark, root, "needlemid w0000", "AND", 10)
      assert(before.nonEmpty)
      IndexMaintenance.deleteConversations(spark, root, Set("conv-00000007"))
      val ts = new java.sql.Timestamp(1700000000000L)
      IndexMaintenance.appendConversations(spark, root, Seq(
        graft.model.Turn("zz-side", 0, "user", "sidecar chain appended", "", ts)))
      val m = IndexManifest.read(root).get
      assert(m.shards.nonEmpty)
      // queries stay correct through sidecar-committed snapshots
      val after = SearchEngine.query(spark, root, "needlemid w0000", "AND", 10)
      assert(after.nonEmpty)
      assert(SearchEngine.query(spark, root, "sidecar", "AND", 5).nonEmpty)
      assert(IndexMaintenance.verifyManifest(spark, root).isEmpty,
        "fsck must stay clean under the sidecar layout")
    } finally IndexManifest.sidecarThresholdOverride = None
  }

  test("serving contract: N repeat queries = 1 manifest read, 0 listings") {
    val root = SparkTestBase.tmpDir("graft-serving-contract")
    val corpus = TranscriptGen.corpus(seed = 5L, nConvs = 60)
    IndexBuilder.build(spark, spark.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[graft.model.Turn]), root,
      shards = 4, waveSize = 4)
    IndexManifest.invalidateCache(root)
    val reads0 = IndexManifest.manifestReads.get()
    val lists0 = IndexManifest.manifestListings.get()
    val hits = (1 to 5).map(_ =>
      SearchEngine.query(spark, root, "needlemid w0000", "AND", 5))
    assert(hits.head.nonEmpty && hits.forall(_ == hits.head))
    assert(IndexManifest.manifestReads.get() - reads0 == 1L,
      "N repeat queries must parse the manifest exactly once")
    assert(IndexManifest.manifestListings.get() - lists0 == 0L,
      "the query path must never LIST the manifest directory")
  }
}
