package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analysis.Analyzer
import graft.fixtures.TranscriptGen
import graft.index.IndexBuilder
import graft.oracle.Oracle

/** Exact-phrase top-k (Lucene PhraseQuery semantics over the analyzed
  * stream): rank-identity against the Oracle's brute-force phrase
  * scorer, subset-of-AND law, and the edge contract (unknown term ⇒
  * empty, no stop cap, duplicate phrase terms). */
class PhraseSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val corpus = TranscriptGen.corpus(seed = 42L, nConvs = 300)
  private lazy val oracle = new Oracle(corpus)
  private lazy val root = {
    val dir = SparkTestBase.tmpDir("graft-phrase")
    IndexBuilder.build(spark, spark.createDataset(corpus), dir,
      shards = 8, waveSize = 4, maxChunkPostings = 64)
    dir
  }

  private val phrases: Seq[(String, Int)] = Seq(
    ("stopish needlemid", 10),   // planted adjacent pair (~2% of docs)
    ("stopish needlemid", 5),    // smaller k of the same phrase
    ("needlemid stopish", 10),   // reversed: same AND set, ≈no adjacency
    ("stopish", 10),             // single-term phrase — NO stop cap
    ("roleuser w0001", 10),      // hot + common
    ("w0000 w0000", 10),         // duplicate-term phrase
    ("needlerare", 10),          // df=3 single term
    ("absentterm w0000", 10),    // unknown term ⇒ empty, not dropped
    ("", 10),                    // blank
    ("w0002 w0005 w0009", 10)    // 3-gram, likely sparse/empty
  )

  test("fixture sanity: the planted phrase has hits and is a strict subset of its AND set") {
    val phraseHits = oracle.phraseTopK("stopish needlemid", k = 1000)
    val andHits = oracle.topK("stopish needlemid", "AND", 100000,
      applyStopCap = false)
    assert(phraseHits.nonEmpty, "planted phrase must occur")
    val andMap = andHits.map(h => h.docId -> h.score).toMap
    phraseHits.foreach { h =>
      assert(andMap.get(h.docId).contains(h.score),
        s"phrase hit ${h.docId} must be an AND hit with the same score")
    }
    // adjacency genuinely filters: 'needlemid stopish' reversed almost
    // never occurs (needlemid is appended AFTER stopish)
    assert(oracle.phraseTopK("needlemid stopish", 1000).size <
      phraseHits.size)
  }

  test("engine phraseTopK: rank-identical (bit-equal scores) to the brute-force oracle") {
    phrases.foreach { case (q, k) =>
      val expected = oracle.phraseTopK(q, k)
      val got = SearchEngine.phraseTopK(spark, root, q, k)
      assert(got == expected, s"phrase '$q' k=$k: got $got expected $expected")
    }
  }

  test("no stop cap: a phrase of a >90%-df term still matches (unlike AND mode)") {
    val viaAnd = SearchEngine.query(spark, root, "stopish", "AND", 10)
    assert(viaAnd.isEmpty, "AND mode must stop-cap 'stopish' away")
    val viaPhrase = SearchEngine.phraseTopK(spark, root, "stopish", 10)
    assert(viaPhrase.nonEmpty)
    assert(viaPhrase == oracle.phraseTopK("stopish", 10))
  }

  test("duplicate-term phrase scores each DISTINCT term once (consistent with AND)") {
    val hits = SearchEngine.phraseTopK(spark, root, "w0000 w0000", 10)
    assert(hits == oracle.phraseTopK("w0000 w0000", 10))
    hits.foreach { h =>
      // every hit's doc really contains the consecutive repeat
      val toks = Analyzer.tokensFor(Analyzer.Version, oracle.text(h.docId))
      assert(toks.containsSlice(Vector("w0000", "w0000")))
    }
  }

  test("phrase results are served from the query memo on repeat (same snapshot)") {
    val a = SearchEngine.phraseTopK(spark, root, "stopish needlemid", 7)
    val b = SearchEngine.phraseTopK(spark, root, "stopish needlemid", 7)
    assert(a == b)
    // different k is a different memo key, not a truncation of the first
    val c = SearchEngine.phraseTopK(spark, root, "stopish needlemid", 3)
    assert(c == a.take(3))
  }
}
