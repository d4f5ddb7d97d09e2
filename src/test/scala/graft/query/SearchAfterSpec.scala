package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.fixtures.TranscriptGen
import graft.index.IndexBuilder
import graft.model.SearchHit

/** search_after deep paging (r7, Lucene IndexSearcher.searchAfter):
  * the page after a cursor is the strictly-after slice of the full
  * result under the (score DESC, docId ASC) total order.
  *
  * The defining law — pages of size p, each cursored off the previous
  * page's last hit, CONCATENATE to the full top-k result — is pinned
  * for every paginable mode against the engine's own full result
  * (itself oracle-verified in the mode's own spec), so ties at page
  * boundaries, the exact-bits cursor and the per-shard heap admission
  * are all exercised by the same walk the user would run. Unlike
  * offset paging (the reference's O3 quirk re-walks everything it
  * skips), the cursor walk stays O(k) work per page at any depth.
  */
class SearchAfterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private lazy val corpus = TranscriptGen.corpus(seed = 42L, nConvs = 250)
  private lazy val root = {
    val dir = SparkTestBase.tmpDir("graft-searchafter")
    IndexBuilder.build(spark, spark.createDataset(corpus)(
      org.apache.spark.sql.Encoders.product[graft.model.Turn]), dir,
      shards = 8, waveSize = 4, maxChunkPostings = 64)
    dir
  }

  private def paginate(pageSize: Int, total: Int)
                      (run: (Int, Option[SearchHit]) => Vector[SearchHit])
      : Vector[SearchHit] = {
    var out = Vector.empty[SearchHit]
    var cursor: Option[SearchHit] = None
    while (out.size < total) {
      val page = run(math.min(pageSize, total - out.size), cursor)
      if (page.isEmpty) return out
      out ++= page
      cursor = Some(page.last)
    }
    out
  }

  test("pages concatenate to the full result — every paginable mode") {
    val full = 60
    // (label, full-result runner, paged runner)
    val modes: Seq[(String, Int => Vector[SearchHit],
        (Int, Option[SearchHit]) => Vector[SearchHit])] = Seq(
      ("AND", k => SearchEngine.query(spark, root, "stopish w0000", "AND", k),
        (k, a) => SearchEngine.query(spark, root, "stopish w0000", "AND", k,
          None, graft.model.QueryFilter.Empty, a)),
      ("OR", k => SearchEngine.query(spark, root, "w0000 w0001", "OR", k),
        (k, a) => SearchEngine.query(spark, root, "w0000 w0001", "OR", k,
          None, graft.model.QueryFilter.Empty, a)),
      ("SHOULD", k => SearchEngine.queryShould(spark, root,
          "needlemid w0000 w0001", 2, k),
        (k, a) => SearchEngine.queryShould(spark, root,
          "needlemid w0000 w0001", 2, k, Nil, None,
          graft.model.QueryFilter.Empty, a)),
      ("NOT", k => SearchEngine.queryNot(spark, root, "stopish w0000",
          "roleuser", k),
        (k, a) => SearchEngine.queryNot(spark, root, "stopish w0000",
          "roleuser", k, Nil, None, graft.model.QueryFilter.Empty, a)),
      ("BOOL", k => SearchEngine.queryBool(spark, root, "stopish",
          "w0000 w0001", "roleuser", 1, k),
        (k, a) => SearchEngine.queryBool(spark, root, "stopish",
          "w0000 w0001", "roleuser", 1, k, Nil, None,
          graft.model.QueryFilter.Empty, a)))
    modes.foreach { case (label, runFull, runPage) =>
      val expected = runFull(full)
      Seq(1, 7, 10).foreach { p =>
        val paged = paginate(p, expected.size)(runPage)
        assert(paged == expected,
          s"$label pages of $p must concatenate to the full result " +
          s"(got ${paged.size} of ${expected.size})")
      }
      // a cursor past the end answers empty, not an error
      if (expected.nonEmpty)
        assert(runPage(10, Some(expected.last)).size ==
          (runFull(expected.size + 10).size - expected.size))
    }
  }

  test("score ties at a page boundary paginate by docId, exactly once each") {
    // w0000 is frequent: plenty of equal-score docs in the OR result
    val full = SearchEngine.query(spark, root, "w0000", "OR", 80)
    val tieScores = full.groupBy(_.score).filter(_._2.size > 1)
    assert(tieScores.nonEmpty, "fixture must contain score ties")
    val paged = paginate(3, full.size)((k, a) =>
      SearchEngine.query(spark, root, "w0000", "OR", k, None,
        graft.model.QueryFilter.Empty, a))
    assert(paged == full, "ties must split across pages without loss or dup")
  }

  test("search composes: parser + filter + after") {
    val filter = graft.model.QueryFilter(role = Some("user"))
    val full = SearchEngine.query(spark, root, "stopish w0000", "AND", 40,
      None, filter)
    val paged = paginate(7, full.size)((k, a) =>
      QueryParser.search(spark, root, "+stopish +w0000 role:user", k, 0,
        Nil, None, a))
    assert(paged == full)
  }

  test("refusals: scopes and phrase do not page") {
    val cursor = Some(SearchHit(5L, 1.0))
    intercept[IllegalArgumentException] {
      SearchEngine.query(spark, root, "w0000", "AND", 10,
        Some("conv-0"), graft.model.QueryFilter.Empty, cursor)
    }
    intercept[IllegalArgumentException] {
      SearchEngine.queryBool(spark, root, "w0000", "w0001", "", 0, 10,
        Seq("conv-0"), None, graft.model.QueryFilter.Empty, cursor)
    }
    intercept[IllegalArgumentException] {
      QueryParser.search(spark, root, "\"stopish needlemid\"", 10, 0, Nil,
        None, cursor)
    }
  }
}
