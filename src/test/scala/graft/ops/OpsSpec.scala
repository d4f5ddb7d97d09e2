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

  test("simhash pairs == brute-force Hamming pairs (recall guaranteed by banding)") {
    // ~120 docs: clusters of small edits (many near pairs at various
    // Hamming radii) + unrelated tails. Deterministic generator.
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val rng = new scala.util.Random(7)
    val texts = (0 until 120).map { i =>
      val baseWords = Vector.tabulate(12)(j => words((i / 10 + j) % words.size))
      val edits = rng.nextInt(4)
      val t = (0 until edits).foldLeft(baseWords) { (acc, _) =>
        acc.updated(rng.nextInt(acc.size), words(rng.nextInt(words.size)))
      }
      t.mkString(" ")
    }
    val docs = docsDf(texts)
    val hashes = Dedup.simHashes(docs).orderBy($"doc_id")
      .collect().map(_.getLong(1))
    def brute(maxHam: Int): Set[(Long, Long, Int)] =
      (for {
        i <- hashes.indices; j <- (i + 1) until hashes.length
        h = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
        if h <= maxHam
      } yield (i.toLong, j.toLong, h)).toSet
    Seq(3, 7, 12).foreach { maxHam =>
      val got = Dedup.simHashPairs(docs, maxHamming = maxHam)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expected = brute(maxHam)
      assert(got == expected,
        s"maxHamming=$maxHam: lsh=${got.size} brute=${expected.size} " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(expected.nonEmpty, s"fixture degenerate at maxHamming=$maxHam")
    }
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

  test("bucketed LSH index: partition-pruned probes, identical to computed-column LSH") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = graft.SparkTestBase.tmpDir("graft-lsh-idx")
    Similarity.buildLshIndex(emb, path, bits = 4)
    val qv = emb.filter($"vec_id" === 0L).head()
      .getSeq[Float](1).map(_.toDouble).toArray
    val indexed = Similarity.lshTopKIndexed(spark, path, qv, 10,
      bits = 4, probeHamming = 2, excludeVecId = Some(0L))
    // identical result set to the unindexed (computed-column) variant
    val unindexed = Similarity.lshTopK(emb, 0L, 10, bits = 4, probeHamming = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toVector
    assert(indexed.collect().map(r => (r.getLong(0), r.getDouble(1))).toVector
      == unindexed)
    // and the scan is PARTITION-pruned on sig (not a full-table filter)
    val p = indexed.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("PartitionFilters: [") && p.contains("sig"),
      s"sig probes must prune partitions:\n$p")
  }

  test("IVF ANN: full probing == brute force; partial probing keeps recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toVector
    // nProbe == nCentroids degrades to exact brute force
    val full = Similarity.ivfTopK(emb, 0L, 10, nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toVector
    assert(full == brute)
    // partial probing: recall against brute force stays useful
    val part = Similarity.ivfTopK(emb, 0L, 10, nCentroids = 8, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute.map(_._1).toSet intersect part).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall at nProbe=3/8")
    // determinism: same centroids, same answer, twice
    val again = Similarity.ivfTopK(emb, 0L, 10, nCentroids = 8, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    assert(again == part)
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
      // unspaced CJK: tokenizes as ONE long token, so word markers can
      // never fire — zh must be detected by marker-char occurrences
      (6L, "我们的系统是在大规模数据上运行的它有很多功能", "zh"),
      // mixed script: zh chars outnumber the single en marker hit
      (7L, "the 系统是在大规模数据上运行的我们有很多功能不一样", "zh"),
    ).toDF("doc_id", "text", "lang")
    val got = TextOps.languageId(docs).orderBy($"doc_id")
      .collect().map(r => r.getString(1))
    assert(got.toSeq == Seq("en", "de", "es", "fr", "ru", "und", "zh", "zh"))
  }

  test("embedding near-dup multi-probe: recall vs brute-force cosine pairs") {
    // 40 base vectors + a tiny-noise near-dup of each (cosine ~0.999).
    // Some near-dup pairs land on hyperplane boundaries (signatures
    // differ in >=1 bit) — the exact failure mode of a same-bucket-only
    // join. Ground truth = brute-force cosine >= threshold.
    val rng = new scala.util.Random(13)
    val dim = 64
    def randVec() = Array.fill(dim)(rng.nextGaussian().toFloat)
    val rows = (0 until 40).flatMap { i =>
      val v = randVec()
      val dup = v.map(x => x + 0.02f * rng.nextGaussian().toFloat)
      Seq((2L * i, v.toSeq), (2L * i + 1, dup.toSeq))
    }
    val emb = rows.toDF("vec_id", "embedding")
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until dim).foreach { k =>
        d += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = rows.toMap
    val truth = (for {
      i <- rows.indices; j <- (i + 1) until rows.size
      v1 = rows(i)._1; v2 = rows(j)._1
      if cos(byId(v1), byId(v2)) >= 0.9
    } yield (v1, v2)).toSet
    assert(truth.size >= 35, s"fixture degenerate: ${truth.size} true pairs")
    val got = Similarity.embeddingNearDupPairs(emb, threshold = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (v1, v2) =>
      assert(cos(byId(v1), byId(v2)) >= 0.9, s"false positive ($v1,$v2)")
    }
    val recall = (truth intersect got).size.toDouble / truth.size
    assert(recall >= 0.9, s"multi-probe recall $recall (${got.size}/${truth.size})")
    // and strictly better than the same-bucket-only join it replaces
    val noProbe = Similarity.embeddingNearDupPairs(emb, threshold = 0.9,
      dim = dim, probeHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noProbe.subsetOf(got))
    assert((truth intersect got).size > (truth intersect noProbe).size,
      "fixture has no boundary pairs — multi-probe untestable")
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

  test("BPE-ish token counting: hand-computed segment counts") {
    val docs = Seq(
      (0L, "I've got 2 cats, don't I? foo_bar"), // 13 segments (validated in both engines)
      (1L, "hello world"),                        // "hello", " world"
      (2L, ""),                                   // empty
      (3L, "привет мир 你好")                     // letter runs incl. CJK
    ).toDF("doc_id", "text")
    val got = TextOps.bpeTokenCounts(docs).orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 13L), (1L, 2L), (2L, 0L), (3L, 3L)), got.toSeq)
  }

  test("rolling hash: deterministic, order-sensitive") {
    val h1 = TextOps.rollingHashUdf
    val df = Seq((0L, Seq("ab", "cd")), (1L, Seq("cd", "ab")), (2L, Seq("ab", "cd")))
      .toDF("id", "toks").withColumn("h", h1($"toks"))
    val hs = df.orderBy($"id").collect().map(_.getLong(2))
    assert(hs(0) == hs(2))
    assert(hs(0) != hs(1))
  }

  // ---- connected components (near-dup clustering) ----------------------

  /** Brute-force union-find with min-id roots (union links the larger
    * root under the smaller, so every final root is its component's min). */
  private def ccBrute(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(n => n -> find(n)).toMap
  }

  private def ccRun(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connected components: 60-node chain (diameter stress) == union-find") {
    // a chain is the worst case for label propagation (diameter = n); the
    // star-contraction loop must still converge in O(log^2 n) rounds
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = ccRun(chain)
    assert(got == ccBrute(chain))
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L until 60L).toSet)
  }

  test("connected components: random graph + cliques + bridge == union-find") {
    val rnd = new scala.util.Random(42)
    val random = Seq.fill(150)((rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
      .filter(p => p._1 != p._2)
    val cliqueA = for (i <- 100L to 104L; j <- (i + 1) to 104L) yield (i, j)
    val cliqueB = for (i <- 200L to 203L; j <- (i + 1) to 203L) yield (i, j)
    val bridge = Seq((104L, 200L)) // merges the two cliques
    val pairs = random ++ cliqueA ++ cliqueB ++ bridge
    val got = ccRun(pairs)
    assert(got == ccBrute(pairs))
    assert(got(203L) == 100L) // bridged cliques share the min root
  }

  test("connected components: 2000-node sparse random graph == union-find") {
    // sparse regime (many mid-size components, some singleton pairs):
    // exercises multiple contraction rounds at a size where a subtle
    // star-step bug would actually surface
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(2400)(
      (rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
      .filter(p => p._1 != p._2)
    val got = ccRun(pairs)
    assert(got == ccBrute(pairs))
  }

  test("connected components: star-contraction plans join on keys (no cartesian)") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val plan = Dedup.connectedComponents(df)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("connected components: empty input; score columns ignored; dup pairs") {
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("d1", "d2")).isEmpty)
    // extra columns (e.g. jaccard) are ignored; duplicate + reversed
    // pairs are harmless
    val df = Seq((1L, 2L, 0.9), (2L, 1L, 0.8), (1L, 2L, 0.9), (5L, 9L, 0.7))
      .toDF("d1", "d2", "jaccard")
    val got = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 9L -> 5L))
  }

  // ---- winnowing fingerprints ------------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  test("winnowing: hand-computed window minima (k=3, w=4)") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val toks = graft.analysis.Analyzer.tokens(text)
    val hs = toks.sliding(3).map(g => md5hex(g.mkString(" "))).toVector
    val expFps = hs.sliding(4).map(_.min).toVector.distinct
    val row = TextOps.winnowFingerprints(docsDf(Seq(text))).head()
    assert(row.getLong(1) == expFps.size.toLong)
    assert(row.getString(2) == md5hex(expFps.sorted.mkString("")))
    val sel = TextOps.winnowSelected(docsDf(Seq(text)))
      .collect().map(_.getString(1)).toSet
    assert(sel == expFps.toSet)
  }

  test("winnowing guarantee: shared run of >= k+w-1 tokens => shared fingerprint") {
    val shared = "orange violet indigo crimson amber cobalt" // 6 = k+w-1 tokens
    val a = s"one two three $shared four five six seven eight"
    val b = s"nine ten eleven twelve $shared thirteen fourteen fifteen"
    val sel = TextOps.winnowSelected(docsDf(Seq(a, b)))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val fpsA = sel.collect { case (0L, fp) => fp }.toSet
    val fpsB = sel.collect { case (1L, fp) => fp }.toSet
    assert((fpsA & fpsB).nonEmpty, "winnowing must catch a k+w-1 shared run")
  }

  test("winnowing: docs below k+w-1 tokens are dropped") {
    val out = TextOps.winnowFingerprints(docsDf(Seq(
      "only five tokens right here", // 5 < 6
      "alpha beta gamma delta epsilon zeta"))) // exactly 6
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  // ---- repetition signals ------------------------------------------------

  test("repetition signals: hand-computed fractions") {
    // tokens [ab ab ab cd]: 2-grams ("ab ab")x2, ("ab cd")x1
    //   top = 2/3, dup = 2/3; top token = 3/4
    val r = TextOps.repetitionSignals(docsDf(Seq("ab ab ab cd")))
      .select($"top_2gram_frac", $"dup_2gram_frac", $"top_token_frac").head()
    assert(r.getDouble(0) == 0.666667)
    assert(r.getDouble(1) == 0.666667)
    assert(r.getDouble(2) == 0.75)
    // all-distinct doc: no repetition anywhere
    val clean = TextOps.repetitionSignals(
      docsDf(Seq("alpha beta gamma delta epsilon")))
      .select($"top_2gram_frac", $"dup_2gram_frac", $"top_token_frac").head()
    assert(clean.getDouble(0) == 0.25) // 1 of 4 2-grams
    assert(clean.getDouble(1) == 0.0)
    assert(clean.getDouble(2) == 0.2)
  }

  // ---- redaction -----------------------------------------------------------

  test("redaction: counts and replacement on planted PII") {
    val text = "contact me at jo.doe+x@mail.example.org or " +
      "https://example.com/a?b=1 id 1234567 short 12345 end"
    val r = TextOps.redact(docsDf(Seq(text))).head()
    assert(r.getLong(1) == 1L, "one email")
    assert(r.getLong(2) == 1L, "one url")
    assert(r.getLong(3) == 1L, "only the 7-digit run (6+ digits)")
    val expected = "contact me at <EMAIL> or <URL> id <ID> short 12345 end"
    assert(r.getString(4) == md5hex(expected))
    // clean text: zero matches, md5 of the original
    val c = TextOps.redact(docsDf(Seq("nothing personal here"))).head()
    assert((c.getLong(1), c.getLong(2), c.getLong(3)) == ((0L, 0L, 0L)))
    assert(c.getString(4) == md5hex("nothing personal here"))
  }

  // ---- decontamination -------------------------------------------------------

  test("decontamination: flags docs sharing a 4-gram with the benchmark") {
    val benchText = "alpha beta gamma delta epsilon zeta"
    val docs = docsDf(Seq(
      benchText, // 0: the benchmark doc
      "xx yy alpha beta gamma delta zz",     // 1: shares 1 distinct 4-gram
      "beta gamma delta epsilon zeta kappa", // 2: shares 2
      "alpha beta gamma kappa delta epsilon" // 3: 4-grams all differ
    ))
    val bench = docs.filter($"doc_id" === 0)
    val corpus = docs.filter($"doc_id" > 0)
    val got = TextOps.contaminationFlags(corpus, bench, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
    // plan shape: the benchmark gram set must broadcast
    val plan = TextOps.contaminationFlags(corpus, bench, n = 4)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ---- deterministic split ------------------------------------------------

  test("deterministic split: stable under repartition, sane fractions") {
    val docs = (0L until 4096L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val s1 = TextOps.deterministicSplit(docs, $"doc_id")
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = TextOps.deterministicSplit(docs.repartition(7), $"doc_id")
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2, "split must be a pure function of the key")
    val n = s1.size.toDouble
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("test") - 1.0 / 32) < 0.02, frac)
    assert(math.abs(frac("val") - 1.0 / 16) < 0.02, frac)
    assert(frac("train") > 0.85, frac)
  }

  // ---- mixture weights ----------------------------------------------------

  test("mixture weights: hand-computed sqrt temperature; normalization sums to 1") {
    // sizes 900 / 90 / 10: p = .9/.09/.01, w = sqrt(p)
    val docs = (Seq.fill(9)(("big", 100L)) ++ Seq.fill(3)(("mid", 30L)) ++
        Seq(("small", 10L)))
      .zipWithIndex.map { case ((src, ch), i) => (i.toLong, src, ch) }
      .toDF("doc_id", "source", "n_chars")
    val w = TextOps.mixtureWeights(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(w("big") == ((9L, 900L, 0.9, math.sqrt(0.9))))
    assert(w("mid") == ((3L, 90L, 0.09, math.sqrt(0.09))))
    assert(w("small") == ((1L, 10L, 0.01, math.sqrt(0.01))))
    // the temperature boosts small sources: relative share grows
    val norm = TextOps.normalizedMixture(TextOps.mixtureWeights(docs))
    assert(math.abs(norm.values.sum - 1.0) < 1e-12)
    assert(norm("small") > 0.01 && norm("small") < norm("mid"),
      s"sqrt temperature must up-sample small sources sub-linearly: $norm")
    assert(norm("big") < 0.9)
    // invariant under physical partitioning
    val w2 = TextOps.mixtureWeights(docs.repartition(5)).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toMap
    w.foreach { case (s, (_, _, _, wv)) => assert(w2(s) == wv) }
  }

  // ---- exact-substring overlap (Lee et al. 2022 class) --------------------

  test("substringOverlapPairs: planted shared substring found, boilerplate fp capped, brute-force twin") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val boiler = "copyright notice footer text here now"          // in many docs
    val docs = Seq(
      (0L, s"unique00 intro $shared outro00 tail00"),
      (1L, s"unique11 lead $shared close11 tail11"),
      (2L, "totally different content with nothing repeated here at all"),
      (3L, s"$boiler first unique page body aa bb cc dd"),
      (4L, s"$boiler second unique page body ee ff gg hh"),
      (5L, s"$boiler third unique page body ii jj kk ll"),
      (6L, s"$boiler fourth unique page body mm nn oo pp"),
      (7L, s"$boiler fifth unique page body qq rr ss tt")
    ).toDF("doc_id", "text")
    // cap at 4: the boilerplate fingerprints (5 docs) are dropped
    val got = TextOps.substringOverlapPairs(docs, minShared = 2L,
        maxDocsPerFp = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((0L, 1L)),
      s"the planted 8-token shared substring must pair docs 0/1: $got")
    assert(got.keys.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 1L)) },
      s"boilerplate above the fp cap must not create pairs: $got")
    // brute-force twin from the engine's own (independently-oracled)
    // fingerprint sets: pair counts over fps in 2..4 docs
    val fps = TextOps.winnowSelected(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
      .filter { case (_, ds) => ds.size >= 2 && ds.size <= 4 }
    val expected = byFp.values.toSeq
      .flatMap(ds => for (i <- ds.indices; j <- i + 1 until ds.size)
        yield (ds(i), ds(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2L)
    assert(got == expected, s"got $got expected $expected")
  }

  // ---- sequence packing ---------------------------------------------------

  test("packSequences: exact global offsets, pack ids, boundary straddles; partitioning-invariant") {
    // hand corpus: token counts 3, 0, 4, 2, 5 in doc_id order; budget 4
    // flat stream offsets: d0@0, d1@3 (empty), d2@3, d3@7, d4@9
    // packs of 4 tokens: d0→pack0, d2 starts pack0 and straddles into
    // pack1, d3 starts pack1 straddling pack2, d4 starts pack2 into 3
    val docs = Seq(
      (0L, "aa bb cc"), (1L, "x"), (2L, "dd ee ff gg"),
      (3L, "hh ii"), (4L, "jj kk ll mm nn")).toDF("doc_id", "text")
    val got = TextOps.packSequences(docs, budget = 4L).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(0L) == ((3L, 0L, 0L, false)))
    assert(got(1L) == ((0L, 3L, 0L, false))) // empty doc: offset only
    assert(got(2L) == ((4L, 3L, 0L, true)))  // tokens 3..6 cross pack 0→1
    assert(got(3L) == ((2L, 7L, 1L, true)))  // tokens 7..8 cross pack 1→2
    assert(got(4L) == ((5L, 9L, 2L, true)))  // tokens 9..13 cross pack 2→3
    // exact at any physical partitioning (the two-phase prefix sum)
    val again = TextOps.packSequences(docs.repartition(7), budget = 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(again == got)
    // brute-force twin on a larger random-ish corpus
    val big = (0L until 300L).map(i =>
      (i, Seq.fill(((i * 7 + 3) % 11).toInt)(s"t${i % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val bigGot = TextOps.packSequences(big, budget = 128L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    var off = 0L
    (0L until 300L).foreach { i =>
      val nt = ((i * 7 + 3) % 11).toInt // "t..." tokens are all length>=2
      val (_, gn, gs, gp, gb) = bigGot(i.toInt)
      assert(gn == nt && gs == off, s"doc $i: ($gn,$gs) vs ($nt,$off)")
      assert(gp == off / 128)
      assert(gb == (nt > 0 && off / 128 != (off + nt - 1) / 128))
      off += nt
    }
  }

  // ---- LM-count quality (CCNet-motivated) ---------------------------------

  private val lmCorpus = Seq(
    (0L, "aa bb aa bb"), // bigrams (aa,bb) (bb,aa) (aa,bb)
    (1L, "aa bb cc"),    // (aa,bb) (bb,cc)
    (2L, "zz"),          // no bigrams — absent from the result
    (3L, "xx yy"))       // (xx,yy)

  test("bigramQuality: hand-computed counts, exact ratio, <2-token docs absent") {
    val docs = lmCorpus.toDF("doc_id", "text")
    val got = TextOps.bigramQuality(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    // corpus bigram counts: (aa,bb)=3, (bb,aa)=1, (bb,cc)=1, (xx,yy)=1
    assert(got(0L) == ((3L, 2L, 7L, 2.0 / 3.0)))
    assert(got(1L) == ((2L, 1L, 4L, 0.5)))
    assert(got(3L) == ((1L, 0L, 1L, 0.0)))
    assert(!got.contains(2L), "a 1-token doc has no bigrams to judge")
    // exact integers + one divide ⇒ bit-identical at any parallelism
    val again = TextOps.bigramQuality(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(again == got)
  }

  test("LM quality plans: key-partitioned joins only — no cartesian, no nested loop") {
    // the 100 TB shape: bigram counts partial-aggregate map-side and join
    // back on the bigram key; nothing may degrade to a cartesian product
    val docs = lmCorpus.toDF("doc_id", "text")
    Seq(TextOps.bigramQuality(docs), TextOps.lmLogProb(docs)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(800))
      // the only nested-loop allowed is the documented 1-row vocab
      // broadcast in lmLogProb
      val nested = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(nested <= 1, plan.take(800))
    }
  }

  test("lmLogProb: Laplace bigram LM average log-prob matches brute force") {
    val docs = lmCorpus.toDF("doc_id", "text")
    val got = TextOps.lmLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // brute force over the same corpus
    val toks = lmCorpus.map { case (id, t) =>
      id -> t.split(" ").filter(_.length >= 2).toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.size }
    val big = toks.flatMap { case (_, ws) => ws.zip(ws.drop(1)) }
      .groupBy(identity).map { case (p, xs) => p -> xs.size }
    val v = uni.size
    toks.filter(_._2.size >= 2).foreach { case (id, ws) =>
      val lps = ws.zip(ws.drop(1)).map { case (w1, w2) =>
        math.log((big((w1, w2)) + 1.0) / (uni(w1) + v.toDouble)) }
      val (n, avg) = got(id)
      assert(n == lps.size)
      assert(math.abs(avg - lps.sum / lps.size) < 1e-12,
        s"doc $id: $avg vs ${lps.sum / lps.size}")
    }
    assert(!got.contains(2L))
    // sanity: boilerplate (repeated bigrams) scores higher than novel text
    assert(got(0L)._2 > got(3L)._2,
      "a doc of corpus-frequent bigrams must out-score all-novel text")
  }
}
