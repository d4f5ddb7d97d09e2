package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analysis.Analyzer
import graft.fixtures.TranscriptGen
import graft.model.{SearchHit, Turn}
import graft.query.{Bm25, SearchEngine}

/** Incremental maintenance (reference §3.3 indexPage path): delete /
  * replace rewrite ONLY the affected shards; the index stays
  * query-correct against a brute-force scorer over its own docs table
  * (docIds keep gaps after deletes, like the reference's deleted MySQL
  * rows — stability over contiguity). */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshIndex(): (String, Vector[Turn]) = {
    val corpus = TranscriptGen.corpus(seed = 11L, nConvs = 200)
    val root = SparkTestBase.tmpDir("graft-maint")
    IndexBuilder.build(spark, spark.createDataset(corpus), root,
      shards = 8, waveSize = 8, maxChunkPostings = 64)
    (root, corpus)
  }

  /** Brute-force BM25 top-k over the index's CURRENT docs table. */
  private def bruteTopK(root: String, query: String, mode: String,
                        k: Int): Vector[SearchHit] = {
    val docs = IndexBuilder.loadDocs(spark, root)
      .select($"docId", $"text").collect()
      .map(r => r.getLong(0) -> Analyzer.tokens(r.getString(1)))
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.size.toLong).sum.toDouble / n
    val dfs = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach(_._2.distinct.foreach(t => dfs.update(t, dfs.getOrElse(t, 0L) + 1)))
    val qTerms0 = Analyzer.analyzeQuery(query).filter(t => dfs.getOrElse(t, 0L) > 0)
    val capped = qTerms0.filter(t => dfs(t) <= 0.9 * n) // unknown terms dropped (ref parity)
    if (capped.isEmpty) return Vector.empty
    val canonical = capped.sortBy(t => (dfs(t), t))
    val hits = docs.flatMap { case (d, toks) =>
      val tf = toks.groupBy(identity).map { case (t, xs) => t -> xs.size }
      val matched = capped.filter(tf.contains)
      val ok = if (mode == "AND") matched.size == capped.size else matched.nonEmpty
      if (!ok) None
      else {
        var s = 0.0
        canonical.foreach(t => tf.get(t).foreach(f =>
          s += Bm25.score(f, dfs(t), toks.size, n, avgdl)))
        Some(SearchHit(d, s))
      }
    }
    hits.sortBy(h => (-h.score, h.docId)).take(k).toVector
  }

  test("delete: removed convs vanish, untouched shards keep their manifest entries") {
    val (root, corpus) = freshIndex()
    val m0 = IndexManifest.read(root).get
    val victims = Set("conv-00000003", "conv-00000050", "conv-00000150")
    val affected = IndexMaintenance.deleteConversations(spark, root, victims)
    assert(affected.nonEmpty && affected.size < 8,
      s"expected a strict subset of shards, got $affected")

    val m1 = IndexManifest.read(root).get
    assert(m1.snapshotId == m0.snapshotId + 1)
    assert(m1.nDocs == m0.nDocs - corpus.count(t => victims(t.conv_id)))
    // untouched shards: identical metric entries (no recomputation)
    val before = m0.shards.filterNot(s => affected.contains(s.shard)).sortBy(_.shard)
    val after = m1.shards.filterNot(s => affected.contains(s.shard)).sortBy(_.shard)
    assert(before == after)
    // deleted docs gone from docs table
    val remaining = IndexBuilder.loadDocs(spark, root)
      .filter($"conv_id".isin(victims.toSeq: _*)).count()
    assert(remaining == 0L)
    // queries rank-identical to brute force over the surviving docs
    Seq(("needlemid w0000", "AND", 10), ("w0001 w0002", "OR", 15),
        ("roleuser w0004", "AND", 10)).foreach { case (q, m, k) =>
      val got = SearchEngine.query(spark, root, q, m, k)
      val expected = bruteTopK(root, q, m, k)
      assert(got == expected, s"post-delete '$q' [$m]")
    }
  }

  test("delete: df decremented set-based (terms of deleted docs)") {
    val (root, corpus) = freshIndex()
    val victims = corpus.filter(_.conv_id == "conv-00000001").toVector
    assert(victims.nonEmpty)
    val termInVictim = Analyzer.tokens(victims.head.text).head
    val dfBefore = IndexBuilder.loadTermStats(spark, root)
      .filter($"term" === termInVictim).head().df
    IndexMaintenance.deleteConversations(spark, root, Set("conv-00000001"))
    val dfAfter = IndexBuilder.loadTermStats(spark, root)
      .filter($"term" === termInVictim).collect().headOption.map(_.df).getOrElse(0L)
    assert(dfAfter < dfBefore, s"df must drop: $dfBefore -> $dfAfter")
  }

  test("replace: same keys keep docIds; new text is searchable; round-trips") {
    val (root, corpus) = freshIndex()
    val target = corpus.find(_.conv_id == "conv-00000002").get
    val oldDoc = IndexBuilder.loadDocs(spark, root)
      .filter($"conv_id" === target.conv_id && $"turn_idx" === target.turn_idx)
      .head()
    val newText = "zzreplacement unique tokens только здесь 😀"
    val replaced = target.copy(text = newText)
    val affected = IndexMaintenance.replaceTurns(spark, root, Seq(replaced))
    assert(affected.size == 1)

    val newDoc = IndexBuilder.loadDocs(spark, root)
      .filter($"conv_id" === target.conv_id && $"turn_idx" === target.turn_idx)
      .head()
    assert(newDoc.docId == oldDoc.docId,
      "replacement must keep the docId")
    assert(newDoc.text == newText) // byte round-trip
    // the new unique term is now retrievable at exactly that doc
    val hits = SearchEngine.query(spark, root, "zzreplacement", "AND", 5)
    assert(hits.map(_.docId) == Vector(oldDoc.docId))
    // and an old-text-only term no longer matches this doc
    val gone = Analyzer.tokens(target.text)
      .filterNot(Analyzer.tokens(newText).contains)
    if (gone.nonEmpty) {
      val stillThere = SearchEngine.query(spark, root, gone.head, "OR", 1000)
      assert(!stillThere.exists(_.docId == oldDoc.docId))
    }
  }

  test("append: later conv_ids extend docIds contiguously into new shards") {
    val (root, corpus) = freshIndex()
    val m0 = IndexManifest.read(root).get
    val maxDoc = IndexBuilder.loadDocs(spark, root)
      .agg(org.apache.spark.sql.functions.max($"docId")).head().getLong(0)
    val ts = new java.sql.Timestamp(1700000000000L)
    val newTurns = Seq(
      Turn("conv-90000000", 0, "user", "zzappended fresh needle terms", "", ts),
      Turn("conv-90000000", 1, "assistant", "zzappended again w0000", "bash", ts),
      Turn("conv-90000001", 0, "user", "another zzappended conversation", "", ts))
    val newShards = IndexMaintenance.appendConversations(spark, root, newTurns)
    assert(newShards.nonEmpty && newShards.forall(_ > m0.shards.map(_.shard).max))

    val m1 = IndexManifest.read(root).get
    assert(m1.nDocs == m0.nDocs + 3)
    // old shard entries untouched
    val oldEntries = m1.shards.filter(s => m0.completedShards(s.shard)).sortBy(_.shard)
    assert(oldEntries == m0.shards.sortBy(_.shard))
    // contiguous new docIds
    val appended = IndexBuilder.loadDocs(spark, root)
      .filter($"conv_id".startsWith("conv-9")).collect().sortBy(_.docId)
    assert(appended.map(_.docId).toSeq == Seq(maxDoc + 1, maxDoc + 2, maxDoc + 3))
    // new content searchable; old content unaffected
    val hits = SearchEngine.query(spark, root, "zzappended", "OR", 10)
    assert(hits.map(_.docId).toSet == Set(maxDoc + 1, maxDoc + 2, maxDoc + 3))
    val brute = bruteTopK(root, "needlemid w0000", "AND", 10)
    assert(SearchEngine.query(spark, root, "needlemid w0000", "AND", 10) == brute)
    // appending an EXISTING key is rejected (that's replaceTurns)
    intercept[IllegalArgumentException] {
      IndexMaintenance.appendConversations(spark, root,
        Seq(corpus.head))
    }
  }

  test("out-of-order append: backfill conv becomes a later docId segment; scoped queries exact") {
    val (root, corpus) = freshIndex()
    val maxDoc = IndexBuilder.loadDocs(spark, root)
      .agg(org.apache.spark.sql.functions.max($"docId")).head().getLong(0)
    val ts = new java.sql.Timestamp(1700000000000L)
    // conv_id sorts BEFORE every existing conv (a backfill) + extends an
    // EXISTING conv with new turn indexes
    val existingConv = "conv-00000005"
    val existingTurns = corpus.count(_.conv_id == existingConv)
    val backfill = Seq(
      Turn("conv-00000000a", 0, "user", "zzbackfill needle one", "", ts),
      Turn("conv-00000000a", 1, "user", "zzbackfill needle two", "", ts),
      Turn(existingConv, 900, "user", "zzbackfill extension turn", "", ts))
    val newShards = IndexMaintenance.appendConversations(spark, root, backfill)
    assert(newShards.nonEmpty)
    // new docs live after maxDoc (stability, not rank order)
    val added = IndexBuilder.loadDocs(spark, root)
      .filter($"text".startsWith("zzbackfill")).collect()
    assert(added.forall(_.docId > maxDoc))
    // searchable globally
    val hits = SearchEngine.query(spark, root, "zzbackfill", "OR", 10)
    assert(hits.size == 3)
    // the extended conv is now docId-NON-contiguous: scoped query must
    // still be exact (segments), including the appended turn
    val scoped = SearchEngine.query(spark, root, "zzbackfill", "OR", 10,
      convPrefix = Some(existingConv))
    assert(scoped.size == 1)
    assert(IndexBuilder.loadDocs(spark, root)
      .filter($"conv_id" === existingConv).count() == existingTurns + 1)
    // scoped stats: a term present only in the old segment still found
    val oldTermHits = SearchEngine.query(spark, root, "w0000", "OR", 50,
      convPrefix = Some(existingConv))
    oldTermHits.foreach(h => assert(
      IndexBuilder.loadDocs(spark, root).filter($"docId" === h.docId)
        .head().conv_id == existingConv))
  }

  test("bulk delete (30% of convs): anti-join path, correct and manifest-consistent") {
    val (root, corpus) = freshIndex()
    val allConvs = corpus.map(_.conv_id).distinct.sorted
    val victims = allConvs.zipWithIndex.collect {
      case (c, i) if i % 3 == 0 => c
    }.toSet // ~1/3 of conversations, spread across every shard
    val affected = IndexMaintenance.deleteConversations(spark, root, victims)
    assert(affected.nonEmpty)
    val m = IndexManifest.read(root).get
    assert(m.nDocs == corpus.count(t => !victims(t.conv_id)))
    assert(IndexBuilder.loadDocs(spark, root)
      .filter($"conv_id".isin(victims.toSeq: _*)).count() == 0L)
    Seq(("needlemid w0000", "AND", 10), ("w0001 w0002", "OR", 15)).foreach {
      case (q, mo, k) =>
        assert(SearchEngine.query(spark, root, q, mo, k) == bruteTopK(root, q, mo, k),
          s"post-bulk-delete '$q' [$mo]")
    }
  }

  test("maintenance invalidates the serving cache AND memoized results (no stale hits)") {
    val (root, corpus) = freshIndex()
    SearchEngine.enableServingCache(spark, root)
    SearchEngine.enableResultCache(root)
    try {
      val before = SearchEngine.query(spark, root, "needlemid", "AND", 10)
      assert(before.nonEmpty)
      // memoized repeat returns the identical result pre-maintenance
      assert(SearchEngine.query(spark, root, "needlemid", "AND", 10) == before)
      val victimConv = IndexBuilder.loadDocs(spark, root)
        .filter($"docId" === before.head.docId).head().conv_id
      IndexMaintenance.deleteConversations(spark, root, Set(victimConv))
      // both caches were dropped by maintenance: the query must re-read
      // the rewritten postings and the old top hit must be gone — a stale
      // memo entry would hand back the deleted doc
      val after = SearchEngine.query(spark, root, "needlemid", "AND", 10)
      assert(after == bruteTopK(root, "needlemid", "AND", 10),
        "post-maintenance query must match brute force over surviving docs")
      assert(!after.exists(_.docId == before.head.docId))
    } finally {
      SearchEngine.disableServingCache(root)
      SearchEngine.disableResultCache(root)
    }
  }

  test("manifest carries shard docId ranges; maintenance keeps them fresh") {
    val (root, corpus) = freshIndex()
    val m0 = IndexManifest.read(root).get
    val ranged = m0.shards.filter(_.minDocId >= 0)
    assert(ranged.nonEmpty, "fresh build must stamp docId ranges")
    // ranges are disjoint, contiguous overall, and cover 0..nDocs-1
    val sorted = ranged.sortBy(_.minDocId)
    assert(sorted.head.minDocId == 0L)
    assert(sorted.last.maxDocId == m0.nDocs - 1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(b.minDocId == a.maxDocId + 1,
        s"gap between shard ${a.shard} and ${b.shard}")
      case _ => ()
    }
    // after a delete, touched shards' ranges reflect the surviving docs
    val affected = IndexMaintenance.deleteConversations(spark, root,
      Set("conv-00000003"))
    val m1 = IndexManifest.read(root).get
    affected.foreach { sh =>
      val e = m1.shards.find(_.shard == sh).get
      val actual = IndexBuilder.loadDocs(spark, root).toDF()
        .filter($"shard" === sh)
        .agg(org.apache.spark.sql.functions.min($"docId"),
          org.apache.spark.sql.functions.max($"docId")).head()
      assert(e.minDocId == actual.getLong(0) && e.maxDocId == actual.getLong(1),
        s"shard $sh manifest range (${e.minDocId},${e.maxDocId}) vs actual")
    }
  }

  test("Dataset-native bulk append: thousands of turns, no driver materialization") {
    val (root, _) = freshIndex()
    val m0 = IndexManifest.read(root).get
    val maxDoc = IndexBuilder.loadDocs(spark, root)
      .agg(org.apache.spark.sql.functions.max($"docId")).head().getLong(0)
    val maxShard = m0.shards.map(_.shard).max
    // a backfill an order of magnitude larger than a micro-batch, arriving
    // as a Dataset (conv ids prefixed so none clash with the fixture)
    val bulk = graft.fixtures.TranscriptGen
      .dataset(spark, seed = 99L, nConvs = 2000L, partitions = 8)
      .map(t => t.copy(conv_id = "zz-" + t.conv_id))
    val nBulk = bulk.count()
    assert(nBulk > 5000, s"bulk fixture too small: $nBulk")
    val newShards = IndexMaintenance.appendConversationsDs(spark, root, bulk,
      newShards = 4)
    assert(newShards.size == 4 && newShards.forall(_ > maxShard))

    val m1 = IndexManifest.read(root).get
    assert(m1.nDocs == m0.nDocs + nBulk)
    // appended docIds are the dense continuation maxDoc+1 .. maxDoc+nBulk
    val agg = IndexBuilder.loadDocs(spark, root)
      .filter($"conv_id".startsWith("zz-"))
      .agg(org.apache.spark.sql.functions.count(
             org.apache.spark.sql.functions.lit(1)),
           org.apache.spark.sql.functions.countDistinct($"docId"),
           org.apache.spark.sql.functions.min($"docId"),
           org.apache.spark.sql.functions.max($"docId")).head()
    assert(agg.getLong(0) == nBulk && agg.getLong(1) == nBulk)
    assert(agg.getLong(2) == maxDoc + 1 && agg.getLong(3) == maxDoc + nBulk)
    // in-batch docId order == (conv_id, turn_idx) rank order (spot check:
    // docId order must sort keys ascending)
    val sample = IndexBuilder.loadDocs(spark, root)
      .filter($"conv_id".startsWith("zz-"))
      .orderBy($"docId").limit(500)
      .select($"conv_id", $"turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(sample.sliding(2).forall {
      case Array(a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      case _ => true
    }, "appended docIds not in (conv_id, turn_idx) order")
    // each new shard is a contiguous docId range in the manifest
    val newEntries = m1.shards.filter(s => newShards.contains(s.shard))
      .sortBy(_.minDocId)
    assert(newEntries.head.minDocId == maxDoc + 1)
    assert(newEntries.last.maxDocId == maxDoc + nBulk)
    newEntries.sliding(2).foreach {
      case Seq(a, b) => assert(b.minDocId == a.maxDocId + 1)
      case _ => ()
    }
    // appended content searchable + scoped query on an appended conv exact
    val brute = bruteTopK(root, "needlemid w0000", "AND", 10)
    assert(SearchEngine.query(spark, root, "needlemid w0000", "AND", 10) == brute)
    val scoped = SearchEngine.query(spark, root, "w0000", "OR", 10,
      convPrefix = Some("zz-conv-0000001"))
    scoped.foreach { h =>
      assert(IndexBuilder.loadDocs(spark, root)
        .filter($"docId" === h.docId).head().conv_id.startsWith("zz-conv-0000001"))
    }
  }

  test("bulk Dataset replace: join path keeps docIds, new text searchable") {
    val (root, corpus) = freshIndex()
    val before = IndexBuilder.loadDocs(spark, root)
      .select($"docId", $"conv_id", $"turn_idx").collect()
      .map(r => (r.getString(1), r.getInt(2)) -> r.getLong(0)).toMap
    // replace ~1/4 of all turns in one distributed batch
    val victims = corpus.zipWithIndex.collect { case (t, i) if i % 4 == 0 =>
      t.copy(text = s"zzbulk${i / 4} replaced body ${t.text.take(20)}")
    }
    val affected = IndexMaintenance.replaceTurnsDs(spark, root,
      spark.createDataset(victims))
    assert(affected.nonEmpty)
    // every replaced key kept its docId; text round-trips
    val after = IndexBuilder.loadDocs(spark, root)
      .filter($"text".startsWith("zzbulk")).collect()
    assert(after.length == victims.size)
    after.foreach { d =>
      assert(before((d.conv_id, d.turn_idx)) == d.docId,
        s"docId moved for (${d.conv_id},${d.turn_idx})")
    }
    // a planted unique term resolves to exactly its doc
    val probe = victims(victims.size / 2)
    val tok = graft.analysis.Analyzer.tokens(probe.text).head // zzbulkN
    val hits = SearchEngine.query(spark, root, tok, "AND", 5)
    assert(hits.map(_.docId) == Vector(before((probe.conv_id, probe.turn_idx))))
    // full rank parity against brute force over the rewritten corpus
    assert(SearchEngine.query(spark, root, "needlemid w0000", "AND", 10) ==
      bruteTopK(root, "needlemid w0000", "AND", 10))
  }

  test("maintenance preserves the one-file-per-shard layout (aligned scan stays on)") {
    val (root, corpus) = freshIndex()
    def alignedOn(): Boolean = {
      SearchEngine.disableServingCache(root) // drop any stale aligned plan
      SearchEngine.alignedPostingsFor(spark, root,
        IndexManifest.read(root).get).isDefined
    }
    assert(alignedOn(), "fresh build must be aligned")
    IndexMaintenance.deleteConversations(spark, root, Set("conv-00000007"))
    assert(alignedOn(), "delete rewrite broke the one-file-per-shard layout")
    IndexMaintenance.replaceTurns(spark, root,
      Seq(corpus.find(_.conv_id == "conv-00000009").get.copy(text = "zzlayout probe")))
    assert(alignedOn(), "replace rewrite broke the one-file-per-shard layout")
    val ts = new java.sql.Timestamp(1700000000000L)
    IndexMaintenance.appendConversations(spark, root,
      Seq(Turn("conv-99990000", 0, "user", "zzlayout appended", "", ts)))
    assert(alignedOn(), "append broke the one-file-per-shard layout")
  }

  test("replace of unknown key is rejected (additions are not silent)") {
    val (root, _) = freshIndex()
    val bogus = Turn("conv-99999999", 0, "user", "x", "", new java.sql.Timestamp(0))
    intercept[IllegalArgumentException] {
      IndexMaintenance.replaceTurns(spark, root, Seq(bogus))
    }
  }

  test("append of zero-posting turns still claims its shard (no docId reuse)") {
    // a micro-batch whose every text analyzes to zero tokens (reachable
    // end-to-end via dedupIngest's zero-token passthrough) writes docs
    // but no postings; its shard MUST still get a manifest entry or the
    // next append would reuse the shard id and re-assign its docIds
    val (root, _) = freshIndex()
    val ts = new java.sql.Timestamp(0)
    val empties = Seq(
      Turn("zz-e1", 0, "user", ". . !", "", ts), // all tokens < 2 chars
      Turn("zz-e2", 0, "user", "", "", ts))
    val s1 = IndexMaintenance.appendConversationsDs(
      spark, root, spark.createDataset(empties))
    val m1 = IndexManifest.read(root).get
    val e1 = m1.shards.filter(e => s1.contains(e.shard))
    assert(e1.nonEmpty && e1.forall(e => e.postings == 0 && e.maxDocId >= 0),
      s"zero-posting shard must be committed with a stamped range: $e1")
    val n1 = IndexBuilder.loadDocs(spark, root).count()
    val s2 = IndexMaintenance.appendConversationsDs(spark, root,
      spark.createDataset(Seq(Turn("zz-e3", 0, "user", "real words here", "", ts))))
    assert(s2.forall(s => !s1.contains(s)), s"shard ids must not be reused: $s1 vs $s2")
    val docs = IndexBuilder.loadDocs(spark, root)
    assert(docs.count() == n1 + 1)
    assert(docs.select("docId").distinct().count() == n1 + 1,
      "docIds must stay unique across appends")
  }

  test("append onto a fully-deleted index restarts the docId space (no NPE wedge)") {
    // ADVICE r04 item 1: after deleting EVERY conversation all manifest
    // entries carry maxDocId = -1, so the append's docs-scan fallback
    // aggregates an empty frame — the null max must become baseDocId 0,
    // not an NPE that wedges streaming ingest until a rebuild
    val (root, corpus) = freshIndex()
    IndexMaintenance.deleteConversations(spark, root,
      corpus.map(_.conv_id).toSet)
    val m1 = IndexManifest.read(root).get
    assert(m1.nDocs == 0L)
    assert(m1.shards.forall(_.maxDocId == -1L),
      "full delete must leave only unstamped (empty) entries")
    assert(IndexBuilder.loadDocs(spark, root).count() == 0L)

    val ts = new java.sql.Timestamp(1700000000000L)
    val appended = IndexMaintenance.appendConversations(spark, root, Seq(
      Turn("zz-reborn", 0, "user", "phoenix rising fresh words", "", ts),
      Turn("zz-reborn", 1, "assistant", "phoenix answered promptly", "", ts)))
    assert(appended.nonEmpty)
    val m2 = IndexManifest.read(root).get
    assert(m2.nDocs == 2L)
    val docs = IndexBuilder.loadDocs(spark, root).select($"docId")
      .as[Long].collect().sorted
    assert(docs.toSeq == Seq(0L, 1L), s"docId space must restart at 0: ${docs.toSeq}")
    // and the emptied-then-refilled index answers queries ("phoenix"
    // itself has df = nDocs = 2 → stop-capped; "rising" has df 1)
    val hits = SearchEngine.query(spark, root, "rising", "AND", 10)
    assert(hits.map(_.docId).toSet == Set(0L))
  }

  test("append onto a legacy-unstamped empty manifest uses baseDocId 0 (loud no, silent NPE)") {
    // a hand-crafted legacy manifest: an UNSTAMPED non-empty entry
    // (postings > 0, maxDocId = -1) forces the docs-scan fallback, and
    // zero doc rows exist on disk — the fallback must read the null max
    // as -1 (baseDocId 0) instead of NPE (ADVICE r04 item 1, second edge)
    val root = graft.SparkTestBase.tmpDir("graft-maint-legacy")
    IndexManifest.commit(root, Manifest(1L, Analyzer.Version, "0-0",
      nDocs = 0L, avgdl = 0.0,
      shards = Seq(ShardEntry(5, 2L, 3L, 10L, Seq(5))), sumDl = -1L))
    val ts = new java.sql.Timestamp(0)
    val appended = IndexMaintenance.appendConversationsDs(spark, root,
      spark.createDataset(Seq(
        Turn("aa-legacy", 0, "user", "legacy append works", "", ts))))
    val m1 = IndexManifest.read(root).get
    val e = m1.shards.filter(s => appended.contains(s.shard))
    assert(e.nonEmpty && e.forall(_.minDocId == 0L),
      s"append onto an empty legacy index must start docIds at 0: $e")
    assert(e.forall(_.shard == 6), // after the phantom entry's shard 5
      s"new shard must follow the manifest's max shard id: $e")
  }
}
