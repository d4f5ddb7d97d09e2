package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.TranscriptGen
import graft.index.IndexBuilder
import graft.model.QueryFilter
import graft.oracle.Oracle

/** The COMBINED Lucene BooleanQuery (r7, `SearchEngine.queryBool`):
  * MUST + SHOULD + MUST_NOT + FILTER in one query.
  *
  *  - rank identity (bit-equal scores) against the Oracle's brute force
  *    over a must/should/not/minMatch case matrix;
  *  - the degenerate laws: each missing clause family collapses to the
  *    dedicated mode (AND / queryNot / queryShould) at bit-equal scores;
  *  - the boost law (minShouldMatch = 0): candidates are EXACTLY the
  *    AND+NOT candidates, and every hit's score is its AND score plus
  *    its matched-SHOULD contributions (never less);
  *  - clause-overlap algebra: SHOULD∩MUST auto-satisfies, SHOULD∩NOT
  *    never matches but still counts, MUST∩NOT ⇒ empty;
  *  - composition with scopes (per-scope stats, best-instance union)
  *    and with typed field filters (post-filter law).
  */
class BoolQuerySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val corpus = TranscriptGen.corpus(seed = 42L, nConvs = 300)
  private lazy val oracle = new Oracle(corpus)
  private lazy val root = {
    val dir = SparkTestBase.tmpDir("graft-boolquery")
    IndexBuilder.build(spark, spark.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[graft.model.Turn]), dir,
      shards = 8, waveSize = 4, maxChunkPostings = 64)
    dir
  }

  // (must, should, not, minShouldMatch, k)
  private val cases: Seq[(String, String, String, Int, Int)] = Seq(
    ("needlemid", "w0000 w0001", "", 0, 10),      // pure boost
    ("needlemid", "w0000 w0001", "", 1, 10),      // count requirement
    ("needlemid", "w0000 w0001", "", 2, 10),      // all optionals required
    ("needlemid", "w0000 w0001", "", 3, 10),      // unsatisfiable ⇒ empty
    ("needlemid w0000", "w0001 w0002", "roleuser", 1, 10), // all four familes
    ("needlemid", "w0000", "w0001", 0, 10),       // boost + exclusion
    ("needlemid", "absentterm w0000", "", 1, 10), // unknown SHOULD still counts
    ("needlemid", "absentterm", "", 1, 10),       // unknown-only SHOULD ⇒ empty
    ("needlemid", "stopish w0000", "", 2, 10),    // stop-capped SHOULD counts
    ("", "w0000 w0001 needlemid", "w0002", 2, 10), // no MUST: SHOULD + NOT
    ("needlerare", "w0000 w0001 w0002 w0003", "", 2, 15), // rare must, wide should
    ("absentterm", "w0000", "", 0, 10),           // unknown MUST ⇒ empty
    ("", "", "w0000", 0, 10))                     // nothing to match ⇒ empty

  test("queryBool: rank-identical (bit-equal scores) to the brute-force oracle") {
    cases.foreach { case (must, should, not, mm, k) =>
      val expected = oracle.boolTopK(must, should, not, mm, k)
      val got = SearchEngine.queryBool(spark, root, must, should, not, mm, k)
      assert(got == expected,
        s"BOOL must='$must' should='$should' not='$not'>=$mm k=$k: " +
        s"got $got expected $expected")
    }
  }

  test("degenerate laws: missing clause families collapse to the dedicated modes") {
    val all = 100000
    assert(SearchEngine.queryBool(spark, root, "needlemid w0000", "", "", 0, all)
      == SearchEngine.query(spark, root, "needlemid w0000", "AND", all),
      "no SHOULD/NOT must be the AND query, bit-equal")
    assert(SearchEngine.queryBool(spark, root, "needlemid w0000", "", "roleuser", 0, all)
      == SearchEngine.queryNot(spark, root, "needlemid w0000", "roleuser", all),
      "no SHOULD must be queryNot, bit-equal")
    assert(SearchEngine.queryBool(spark, root, "", "needlemid w0000 w0001", "", 2, all)
      == SearchEngine.queryShould(spark, root, "needlemid w0000 w0001", 2, all),
      "no MUST/NOT must be queryShould, bit-equal")
    assert(SearchEngine.queryBool(spark, root, "", "needlemid w0000", "", 0, all)
      == SearchEngine.queryShould(spark, root, "needlemid w0000", 1, all),
      "no MUST with minMatch 0 takes Lucene's at-least-one rule")
  }

  test("boost law (minShouldMatch=0): AND candidates exactly, scores only grow") {
    val all = 100000
    val and = SearchEngine.query(spark, root, "needlemid", "AND", all)
    val boosted = SearchEngine.queryBool(spark, root, "needlemid",
      "w0000 w0001", "", 0, all)
    assert(boosted.map(_.docId).toSet == and.map(_.docId).toSet,
      "optional clauses must not add or remove candidates")
    val andScore = and.map(h => h.docId -> h.score).toMap
    boosted.foreach(h => assert(h.score >= andScore(h.docId),
      s"boosted score of ${h.docId} fell below its AND score"))
    // ...and the boost genuinely re-ranks: some doc holds an optional term
    assert(boosted.exists(h => h.score > andScore(h.docId)),
      "fixture must contain at least one boosted hit")
  }

  test("clause-overlap algebra") {
    val all = 100000
    // SHOULD ∩ MUST auto-satisfies: requirement drops by one per overlap
    assert(SearchEngine.queryBool(spark, root, "needlemid", "needlemid w0000", "", 2, all)
      == SearchEngine.queryBool(spark, root, "needlemid", "w0000", "", 1, all),
      "a SHOULD term that is also MUST reduces the requirement")
    // ...and never double-counts score (set semantics, documented)
    assert(SearchEngine.queryBool(spark, root, "needlemid", "needlemid", "", 0, all)
      == SearchEngine.query(spark, root, "needlemid", "AND", all),
      "SHOULD == MUST must not double-count")
    // MUST ∩ MUST_NOT surviving planning ⇒ empty
    assert(SearchEngine.queryBool(spark, root, "needlemid w0000", "w0001",
      "w0000", 0, all).isEmpty)
    // SHOULD ∩ MUST_NOT: never matches, still counts toward the req
    assert(SearchEngine.queryBool(spark, root, "needlemid", "w0000", "w0000", 1, all)
      .isEmpty, "the only SHOULD term is prohibited and the req is 1")
    assert(SearchEngine.queryBool(spark, root, "needlemid", "w0000 w0001",
        "w0000", 1, all)
      == SearchEngine.queryBool(spark, root, "needlemid", "w0001", "w0000", 1, all),
      "a prohibited SHOULD term can never be the one that matches")
  }

  test("scoped queryBool: per-scope stats + best-instance union == scoped oracle") {
    Seq(Seq("conv-0000001"), Seq("conv-000000", "conv-0000001"),
        Seq("zz-no-such")).foreach { scopes =>
      Seq(("needlemid", "w0000 w0001", "", 1),
          ("stopish", "w0000 w0001", "roleuser", 0),
          ("needlemid w0000", "w0001 w0002", "w0003", 1)).foreach {
        case (must, should, not, mm) =>
          val expected = oracle.boolTopKScoped(must, should, not, mm, 10, scopes)
          val got = SearchEngine.queryBool(spark, root, must, should, not,
            mm, 10, scopes)
          assert(got == expected,
            s"scoped BOOL '$must'/'$should'/'$not'>=$mm $scopes: " +
            s"got $got expected $expected")
      }
    }
  }

  test("queryBool composes with typed field filters (post-filter law)") {
    val roleF = QueryFilter(role = Some("user"))
    Seq(("needlemid", "w0000 w0001", "", 1),
        ("needlemid", "w0000 w0001", "w0002", 0)).foreach {
      case (must, should, not, mm) =>
        val expected = oracle.boolTopKFiltered(must, should, not, mm, 10, roleF)
        val got = SearchEngine.queryBool(spark, root, must, should, not, mm,
          10, Nil, None, roleF)
        assert(got == expected,
          s"filtered BOOL '$must'/'$should'/'$not'>=$mm: " +
          s"got $got expected $expected")
    }
  }

  test("per-clause boosts: oracle rank identity, identity law, refusals") {
    val all = 100000
    // boosted vs the boosted oracle (bit-equal fold with one multiply)
    Seq(
      (Map("w0000" -> 2.5), "needlemid", "w0000 w0001", "", 1),
      (Map("needlemid" -> 3.0, "w0001" -> 0.5), "needlemid", "w0000 w0001", "roleuser", 0),
      (Map("w0000" -> 10.0), "", "w0000 w0001 needlemid", "", 2)
    ).foreach { case (b, must, should, not, mm) =>
      val expected = oracle.boolTopK(must, should, not, mm, 20, None, b)
      val got = SearchEngine.queryBool(spark, root, must, should, not, mm,
        20, Nil, None, graft.model.QueryFilter.Empty, None, b)
      assert(got == expected, s"boosted BOOL $b '$must'/'$should': " +
        s"got $got expected $expected")
    }
    // boost 1.0 everywhere IS the unboosted query, bit-equal
    assert(SearchEngine.queryBool(spark, root, "needlemid", "w0000", "", 0,
        all, Nil, None, graft.model.QueryFilter.Empty, None,
        Map("needlemid" -> 1.0, "w0000" -> 1.0))
      == SearchEngine.queryBool(spark, root, "needlemid", "w0000", "", 0, all))
    // a large boost genuinely re-ranks: plain top-5 leads with the
    // rare term's high-idf docs; a 50x boost on the HOT term must
    // displace them
    val plain = SearchEngine.queryBool(spark, root, "",
      "w0000 needlerare", "", 1, 5)
    val boosted = SearchEngine.queryBool(spark, root, "",
      "w0000 needlerare", "", 1, 5, Nil, None,
      graft.model.QueryFilter.Empty, None, Map("w0000" -> 50.0))
    assert(plain.map(_.docId) != boosted.map(_.docId),
      "a 50x rare-term boost must change the top-5")
    intercept[IllegalArgumentException] {
      SearchEngine.queryBool(spark, root, "a", "b", "", 0, 10, Nil, None,
        graft.model.QueryFilter.Empty, None, Map("b" -> 0.0))
    }
  }

  test("queryBool + search_after compose with snapshot time travel") {
    // a private root: maintenance must not disturb the shared fixture
    val dir = SparkTestBase.tmpDir("graft-boolquery-tt")
    IndexBuilder.build(spark, spark.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[graft.model.Turn]), dir,
      shards = 4, waveSize = 4, maxChunkPostings = 64)
    val m0 = graft.index.IndexManifest.read(dir).get
    val before = SearchEngine.queryBool(spark, dir, "needlemid",
      "w0000 w0001", "roleuser", 1, 30, Nil, Some(m0))
    assert(before.nonEmpty)
    graft.index.IndexMaintenance.deleteConversations(spark, dir,
      Set(corpus.head.conv_id, corpus(40).conv_id))
    // pinned to the OLD snapshot: identical result after the delete
    assert(SearchEngine.queryBool(spark, dir, "needlemid",
      "w0000 w0001", "roleuser", 1, 30, Nil, Some(m0)) == before,
      "a pinned snapshot must serve the pre-delete result")
    // the live view differs (a conv with hits was deleted) and still
    // paginates: pages off the NEW snapshot concatenate to its full result
    val liveFull = SearchEngine.queryBool(spark, dir, "needlemid",
      "w0000 w0001", "roleuser", 1, 30)
    var paged = Vector.empty[graft.model.SearchHit]
    var cursor: Option[graft.model.SearchHit] = None
    while (paged.size < liveFull.size) {
      val page = SearchEngine.queryBool(spark, dir, "needlemid",
        "w0000 w0001", "roleuser", 1,
        math.min(7, liveFull.size - paged.size), Nil, None,
        QueryFilter.Empty, cursor)
      assert(page.nonEmpty, "pagination must make progress")
      paged ++= page
      cursor = Some(page.last)
    }
    assert(paged == liveFull, "post-maintenance pages concatenate exactly")
  }

  test("boosts compose with filters and scopes") {
    val roleF = QueryFilter(role = Some("user"))
    val b = Map("w0000" -> 5.0)
    // boost + filter: post-filter law against the boosted oracle
    val expected = oracle.boolTopK("needlemid", "w0000 w0001", "", 0,
        Int.MaxValue, None, b)
      .filter(h => oracle.docPasses(roleF)(h.docId)).take(10)
    val got = SearchEngine.queryBool(spark, root, "needlemid",
      "w0000 w0001", "", 0, 10, Nil, None, roleF, None, b)
    assert(got == expected, "boost × filter law")
    // boost + scopes: scoped boosted oracle
    val scopes = Seq("conv-0000001", "conv-000000")
    assert(SearchEngine.queryBool(spark, root, "stopish w0000", "w0001", "",
        0, 10, scopes, None, QueryFilter.Empty, None, b)
      == oracle.boolTopKScoped("stopish w0000", "w0001", "", 0, 10, scopes, b),
      "boost × scope law")
  }

  test("minShouldMatch < 0 refuses") {
    intercept[IllegalArgumentException] {
      SearchEngine.queryBool(spark, root, "needlemid", "w0000", "", -1, 10)
    }
  }
}
