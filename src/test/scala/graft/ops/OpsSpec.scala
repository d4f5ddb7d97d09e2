package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the semantics of the non-SQL-expressible training-pipeline
  * operators (the driver can only rows-check these): MinHash/LSH, SimHash,
  * embedding LSH, language-ID, exact dedup. Planted fixtures with known
  * ground truth. */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private val base =
    "the quick brown fox jumps over the lazy dog near the old river bank today"

  test("exact dedup: keep-first on planted duplicates") {
    val docs = docsDf(Seq(base, "unrelated text entirely", base, base))
    val kept = Dedup.exactDedup(docs).select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 1L))
    val sum = Dedup.exactSummary(docs).head()
    assert((sum.getLong(0), sum.getLong(1), sum.getLong(2)) == ((4L, 2L, 2L)))
  }

  test("minhash LSH: finds planted near-duplicates, skips unrelated") {
    val nearDup = base.replace("today", "tonight") // 1-word edit
    val docs = docsDf(Seq(
      base, nearDup,
      "completely different content about spark shuffles and partitions here",
      "another unrelated document mentioning catalyst optimizer rules only"))
    val pairs = Dedup.minHashCandidatePairs(docs, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 > 0.5),
      s"expected (0,1) near-dup pair, got ${pairs.toSeq}")
    assert(!pairs.exists(p => p._2 == 2L || p._2 == 3L || p._1 == 2L || p._1 == 3L))
  }

  test("minhash signatures are deterministic across invocations") {
    val docs = docsDf(Seq(base, base.toUpperCase))
    val s1 = Dedup.minHashSignatures(docs).orderBy($"doc_id")
      .collect().map(_.getSeq[Int](1))
    val s2 = Dedup.minHashSignatures(docs).orderBy($"doc_id")
      .collect().map(_.getSeq[Int](1))
    assert(s1.toSeq.map(_.toSeq) == s2.toSeq.map(_.toSeq))
    // case-insensitive analyzer ⇒ identical signatures
    assert(s1(0).toSeq == s1(1).toSeq)
  }

  test("simhash: identical text ⇒ hamming 0; near-dup small; unrelated large") {
    val nearDup = base.replace("today", "tonight")
    val docs = docsDf(Seq(base, base, nearDup,
      "totally disjoint vocabulary concerning quantum flux capacitors instead"))
    val hashes = Dedup.simHashes(docs).orderBy($"doc_id")
      .collect().map(_.getLong(1))
    assert(hashes(0) == hashes(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(0), hashes(2)) <= 12,
      s"near-dup hamming ${ham(hashes(0), hashes(2))}")
    assert(ham(hashes(0), hashes(3)) > 12,
      s"unrelated hamming ${ham(hashes(0), hashes(3))}")
    val pairs = Dedup.simHashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("embedding LSH top-k: high recall vs brute force on testdata") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(emb, 0L, 10, bits = 4, probeHamming = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall $recall too low (brute=$brute lsh=$lsh)")
  }

  test("embedding near-dup pairs: symmetric-free (d1<d2), sim >= threshold") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Similarity.embeddingNearDupPairs(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs.foreach { case (v1, v2, sim) =>
      assert(v1 < v2)
      assert(sim >= 0.4)
    }
  }

  test("cosine column matches scalar computation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val two = emb.filter($"vec_id".isin(1L, 2L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def scalarCos(a: Array[Double], b: Array[Double]) = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until a.length).foreach { i => d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = scalarCos(two(1L), two(2L))
    val got = Similarity.bruteForceTopK(emb.filter($"vec_id".isin(1L, 2L)), 1L, 1)
      .head().getDouble(1)
    assert(math.abs(got - math.rint(expected * 1e6) / 1e6) < 1e-9)
  }

  test("language-ID: classifies planted texts per language markers") {
    val docs = Seq(
      (0L, "the cat is in the house and it is warm", "en"),
      (1L, "der hund ist nicht in das haus und die katze", "de"),
      (2L, "el perro es grande y la casa es un lugar en que vivir", "es"),
      (3L, "le chien est dans la maison et les chats", "fr"),
      (4L, "и он сказал что это не на самом деле как прежде", "ru"),
      (5L, "zzz qqq xxx", "und"),
    ).toDF("doc_id", "text", "lang")
    val got = TextOps.languageId(docs).orderBy($"doc_id")
      .collect().map(r => r.getString(1))
    assert(got.toSeq == Seq("en", "de", "es", "fr", "ru", "und"))
  }

  test("quality metrics: hand-computed values on a planted doc") {
    val docs = Seq((0L, "aa bb aa x cc", "en", "src", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextOps.qualityMetrics(docs).head()
    assert(r.getLong(1) == 13L)  // n_chars
    assert(r.getLong(2) == 4L)   // tokens: aa bb aa cc ('x' dropped)
    assert(r.getLong(3) == 3L)   // distinct
    assert(r.getDouble(4) == 2.0) // avg token len
    assert(r.getDouble(5) == 0.75)
  }

  test("rolling hash: deterministic, order-sensitive") {
    val h1 = TextOps.rollingHashUdf
    val df = Seq((0L, Seq("ab", "cd")), (1L, Seq("cd", "ab")), (2L, Seq("ab", "cd")))
      .toDF("id", "toks").withColumn("h", h1($"toks"))
    val hs = df.orderBy($"id").collect().map(_.getLong(2))
    assert(hs(0) == hs(2))
    assert(hs(0) != hs(1))
  }
}
