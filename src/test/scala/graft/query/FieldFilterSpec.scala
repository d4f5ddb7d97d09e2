package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexManifest}
import graft.model.QueryFilter
import graft.oracle.Oracle

/** Typed field predicates (r7, Lucene BooleanQuery FILTER clauses):
  *
  *  - role/tool equality + ts ranges against the Oracle's post-filter
  *    brute force (FILTER semantics make post-filtering the definition:
  *    scores and statistics are untouched, so the filtered result IS the
  *    unfiltered result minus non-matching docs);
  *  - composition with every mode (AND/OR/SHOULD/NOT/phrase/NEAR/prefix),
  *    with scopes (per-scope stats preserved) and across BOTH phrase
  *    paths (positional in-walk probes vs docs-join rescan);
  *  - the FILTER laws: filtered ⊆ unfiltered at IDENTICAL scores; empty
  *    filter == plain query;
  *  - format invisibility: a fields build changes no dictionary row, no
  *    corpus statistic, no unfiltered ranking vs a fields=false build;
  *  - the fields=false refusal (loud, like the positions contract).
  */
class FieldFilterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val corpus = TranscriptGen.corpus(seed = 42L, nConvs = 250)
  private lazy val oracle = new Oracle(corpus)
  private def ds = spark.createDataset(corpus)(
    org.apache.spark.sql.Encoders.product[graft.model.Turn])

  private lazy val root = { // rescan-path root (no positions)
    val dir = SparkTestBase.tmpDir("graft-fields-flat")
    IndexBuilder.build(spark, ds, dir, shards = 8, waveSize = 4,
      maxChunkPostings = 64)
    dir
  }
  private lazy val posRoot = { // positional root (in-walk probe path)
    val dir = SparkTestBase.tmpDir("graft-fields-pos")
    IndexBuilder.build(spark, ds, dir, shards = 8, waveSize = 4,
      maxChunkPostings = 64, positions = true)
    dir
  }
  private lazy val legacyRoot = { // fields=false: the refusal contract
    val dir = SparkTestBase.tmpDir("graft-fields-legacy")
    IndexBuilder.build(spark, ds, dir, shards = 4, waveSize = 4,
      fields = false)
    dir
  }

  private val roleF = QueryFilter(role = Some("user"))
  private val toolF = QueryFilter(tool = Some("bash"))
  private val bothF = QueryFilter(role = Some("tool"), tool = Some("search"))

  private def tsAt(ms: Long) = new java.sql.Timestamp(ms)
  // fixture ts = 1700000000000 + convIdx*97000 + turn*1000 — this window
  // covers roughly convs 40..120 (a strict subset, non-empty)
  private val tsF = QueryFilter(tsFrom = Some(tsAt(1700000000000L + 40 * 97000L)),
    tsTo = Some(tsAt(1700000000000L + 120 * 97000L)))
  private val tsRoleF = tsF.copy(role = Some("assistant"))

  test("AND/OR + role/tool/ts filters: rank-identical to the post-filter oracle") {
    val cases = Seq(
      ("stopish needlemid", "AND", roleF),
      ("stopish needlemid", "AND", toolF),
      ("w0000 w0001", "AND", bothF),
      ("stopish needlemid", "AND", tsF),
      ("stopish needlemid", "AND", tsRoleF),
      ("w0000 w0001", "OR", roleF),
      ("w0000 w0001", "OR", tsRoleF),
      ("needlerare", "AND", roleF),        // rare term × hot filter
      ("absentterm", "AND", roleF),        // unknown term: still empty
      ("stopish needlemid", "AND", QueryFilter(role = Some("nosuchrole"))))
    cases.foreach { case (q, mode, f) =>
      val expected = oracle.topKFiltered(q, mode, 10, f)
      val got = SearchEngine.query(spark, root, q, mode, 10, None, f)
      assert(got == expected, s"$mode '$q' $f: got $got expected $expected")
    }
  }

  test("FILTER laws: filtered ⊆ unfiltered at IDENTICAL scores; empty filter == plain") {
    val all = 100000
    val plain = SearchEngine.query(spark, root, "stopish needlemid", "AND", all)
    val filt = SearchEngine.query(spark, root, "stopish needlemid", "AND", all,
      None, roleF)
    val plainMap = plain.map(h => h.docId -> h.score).toMap
    assert(filt.nonEmpty && filt.size < plain.size, "the filter has teeth")
    filt.foreach(h => assert(plainMap.get(h.docId).contains(h.score),
      s"filtered hit ${h.docId} must keep its unfiltered score"))
    filt.foreach(h => assert(oracle.docPasses(roleF)(h.docId)))
    plain.filterNot(h => filt.exists(_.docId == h.docId))
      .foreach(h => assert(!oracle.docPasses(roleF)(h.docId)))
    assert(SearchEngine.query(spark, root, "stopish needlemid", "AND", all,
      None, QueryFilter.Empty) == plain)
  }

  test("SHOULD/NOT + filters: rank-identical to the post-filter oracle") {
    assert(SearchEngine.queryShould(spark, root, "needlemid w0000 w0001", 2,
        10, Nil, None, roleF)
      == oracle.shouldTopKFiltered("needlemid w0000 w0001", 2, 10, roleF))
    assert(SearchEngine.queryShould(spark, root, "needlemid w0000 w0001", 2,
        10, Nil, None, tsF)
      == oracle.shouldTopKFiltered("needlemid w0000 w0001", 2, 10, tsF))
    assert(SearchEngine.queryNot(spark, root, "stopish needlemid", "w0000",
        10, Nil, None, roleF)
      == oracle.andNotTopKFiltered("stopish needlemid", "w0000", 10, roleF))
    assert(SearchEngine.queryNot(spark, root, "stopish needlemid", "w0000",
        10, Nil, None, tsRoleF)
      == oracle.andNotTopKFiltered("stopish needlemid", "w0000", 10, tsRoleF))
  }

  test("phrase/NEAR/prefix + filters: both phrase paths, rank-identical") {
    Seq(root, posRoot).foreach { r =>
      assert(SearchEngine.phraseTopK(spark, r, "stopish needlemid", 10, Nil,
          None, roleF)
        == oracle.phraseTopKFiltered("stopish needlemid", 10, roleF),
        s"phrase+role on $r")
      assert(SearchEngine.phraseTopK(spark, r, "stopish needlemid", 10, Nil,
          None, tsF)
        == oracle.phraseTopKFiltered("stopish needlemid", 10, tsF),
        s"phrase+ts on $r")
      assert(SearchEngine.nearTopK(spark, r, "stopish needlemid", 3, 10, Nil,
          None, filter = toolF)
        == oracle.nearTopKFiltered("stopish needlemid", 3, 10, toolF),
        s"near+tool on $r")
    }
    assert(SearchEngine.prefixTopK(spark, root, "needle", 10, Nil, None, roleF)
      == oracle.prefixTopKFiltered("needle", 10, roleF))
  }

  test("filters compose with scopes: per-scope stats preserved, filter applied") {
    val scopes = Seq("conv-0000001", "conv-0000002")
    assert(SearchEngine.queryScoped(spark, root, "stopish w0000", "AND", 10,
        scopes, roleF)
      == oracle.topKScopedFiltered("stopish w0000", "AND", 10, scopes, roleF))
    assert(SearchEngine.phraseTopK(spark, posRoot, "stopish needlemid", 10,
        Seq("conv-000000"), None, roleF)
      == oracle.phraseTopKScopedFiltered("stopish needlemid", 10,
        Seq("conv-000000"), roleF))
  }

  test("fields build is invisible to the dictionary, statistics and unfiltered ranks") {
    val mF = IndexManifest.read(root).get
    val mL = IndexManifest.read(legacyRoot).get
    assert(mF.fields && !mL.fields)
    assert(mF.nDocs == mL.nDocs && mF.sumDl == mL.sumDl && mF.avgdl == mL.avgdl,
      "corpus statistics must not see field postings")
    // dictionary identical (term_stats excludes the reserved namespace)
    val dF = IndexBuilder.loadTermStats(spark, root)
      .collect().map(_.toString).sorted
    val dL = IndexBuilder.loadTermStats(spark, legacyRoot)
      .collect().map(_.toString).sorted
    assert(dF.sameElements(dL), "dictionary must be identical across builds")
    // unfiltered ranking identical
    Seq(("stopish needlemid", "AND"), ("w0000 w0001", "OR")).foreach {
      case (q, mode) =>
        assert(SearchEngine.query(spark, root, q, mode, 10)
          == SearchEngine.query(spark, legacyRoot, q, mode, 10), s"$mode $q")
    }
    // expansions cannot surface field postings ('role…'/'tool…' TEXT
    // tokens exist — the fixture folds them into text — but the reserved
    // namespace itself is invisible, so both builds expand identically)
    assert(SearchEngine.prefixTopK(spark, root, "role", 10)
      == SearchEngine.prefixTopK(spark, legacyRoot, "role", 10))
  }

  test("fields=false index refuses field/ts filters loudly") {
    val e = intercept[IllegalStateException] {
      SearchEngine.query(spark, legacyRoot, "stopish", "AND", 10, None, roleF)
    }
    assert(e.getMessage.contains("fields"))
    intercept[IllegalStateException] {
      SearchEngine.phraseTopK(spark, legacyRoot, "stopish needlemid", 10, Nil,
        None, tsF)
    }
    // empty-after-fold filter values refuse too (no posting can exist)
    intercept[IllegalArgumentException] {
      SearchEngine.query(spark, root, "stopish", "AND", 10, None,
        QueryFilter(tool = Some("   ")))
    }
  }

  test("whitespace-padded field values match identically on BOTH paths (Java-trim rule)") {
    // a doc whose role carries a tab: Analyzer.fold(v.trim) strips every
    // char <= U+0020 (Java trim), so the field POSTING is 'user'; the
    // rescan path's doc-column predicate must apply the same rule (r7
    // review: Spark's trim() strips spaces only, and the tabbed doc
    // matched positionally but vanished on the rescan path)
    val padded = corpus.take(60).map(t =>
      if (t.role == "user") t.copy(role = "user\t") else t)
    val dsP = spark.createDataset(padded)(
      org.apache.spark.sql.Encoders.product[graft.model.Turn])
    val flatDir = SparkTestBase.tmpDir("graft-fields-pad-flat")
    val posDir = SparkTestBase.tmpDir("graft-fields-pad-pos")
    IndexBuilder.build(spark, dsP, flatDir, shards = 2, waveSize = 2,
      maxChunkPostings = 64)
    IndexBuilder.build(spark, dsP, posDir, shards = 2, waveSize = 2,
      maxChunkPostings = 64, positions = true)
    // phrase+filter exercises the rescan path on flatDir and the
    // positional walk on posDir — identical results required
    val viaRescan = SearchEngine.phraseTopK(spark, flatDir,
      "stopish needlemid", 100, Nil, None, roleF)
    val viaWalk = SearchEngine.phraseTopK(spark, posDir,
      "stopish needlemid", 100, Nil, None, roleF)
    assert(viaRescan == viaWalk, "tabbed role must match on both paths")
    assert(viaRescan.nonEmpty, "fixture slice must contain user-role hits")
  }

  test("maintenance preserves field postings and ts: delete/append then filtered query") {
    val dir = SparkTestBase.tmpDir("graft-fields-maint")
    IndexBuilder.build(spark, ds, dir, shards = 4, waveSize = 4,
      maxChunkPostings = 64)
    // the FILTER law (filtered == plain post-filtered by the engine's own
    // docs table) re-asserted AFTER each maintenance op: if a rewrite
    // dropped field postings or the ts column, the filtered side would
    // diverge (or refuse) while the plain side stays green
    def lawHolds(q: String): Unit = {
      import org.apache.spark.sql.functions.col
      val rows = IndexBuilder.loadDocs(spark, dir).toDF()
        .select(col("docId"), col("role"), col("tool"), col("ts")).collect()
      val role = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
      val ts = rows.map(r => r.getLong(0) -> r.getTimestamp(3)).toMap
      val all = 100000
      val plain = SearchEngine.query(spark, dir, q, "AND", all)
      assert(plain.nonEmpty)
      val gotRole = SearchEngine.query(spark, dir, q, "AND", all, None, roleF)
      assert(gotRole == plain.filter(h => role(h.docId) == "user"))
      val gotTs = SearchEngine.query(spark, dir, q, "AND", all, None, tsF)
      assert(gotTs == plain.filter { h =>
        val t = ts(h.docId)
        !t.before(tsF.tsFrom.get) && !t.after(tsF.tsTo.get)
      })
    }
    lawHolds("stopish w0000")
    graft.index.IndexMaintenance.deleteConversations(spark, dir,
      Set("conv-00000003", "conv-00000007"))
    lawHolds("stopish w0000")
    val extra = TranscriptGen.corpus(seed = 99L, nConvs = 6)
      .map(t => t.copy(conv_id = "zz-" + t.conv_id))
    graft.index.IndexMaintenance.appendConversations(spark, dir, extra)
    lawHolds("stopish w0000")
  }
}
