package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

import graft.analysis.Analyzer

/** Deduplication operators for a training-data pipeline over
  * `documents(doc_id, text, ...)` — exact, MinHash+LSH, SimHash, n-gram
  * Jaccard. Designed for the 100 TB shape:
  *
  *  - exact/fingerprint dedup is one hash-groupBy (map-side partial);
  *  - MinHash/SimHash signatures are a map stage; candidate generation is
  *    a self-join ON BUCKET KEYS ONLY (band hash / simhash band), never an
  *    all-pairs product; exact verification runs only inside buckets;
  *  - all hash functions are seeded MurmurHash3 — deterministic across
  *    JVMs, runs and parallelism levels.
  */
object Dedup {

  /** Word shingles (n-grams of the analyzed token stream). */
  def shinglesUdf(n: Int) = udf { (text: String) =>
    Analyzer.tokens(text).sliding(n).filter(_.size == n).map(_.mkString(" ")).toVector
  }

  /** Exact-duplicate summary in one pass: total docs, distinct texts,
    * docs that would be dropped by keep-first dedup (reference J5 analog:
    * visited-set dedup, ParseAction.java:192-203). */
  def exactSummary(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      count_distinct(col("text")).as("n_distinct"),
      (count(lit(1)) - count_distinct(col("text"))).as("n_dupes"))

  /** Keep-first exact dedup: one row per distinct text, keeping the
    * smallest doc_id (deterministic winner). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  // ---- MinHash + LSH -------------------------------------------------

  /** numHashes seeded permutation-hash minima over shingles. */
  def minHashSignatures(docs: DataFrame, shingleN: Int = 3,
                        numHashes: Int = 32): DataFrame = {
    val numH = numHashes
    val sigUdf = udf { (shingles: Seq[String]) =>
      if (shingles.isEmpty) Array.fill(numH)(Int.MaxValue)
      else Array.tabulate(numH) { i =>
        var m = Int.MaxValue
        shingles.foreach { s =>
          val h = MurmurHash3.stringHash(s, i * 0x9E3779B9 + 1)
          if (h < m) m = h
        }
        m
      }
    }
    docs.select(col("doc_id"),
      sigUdf(shinglesUdf(shingleN)(col("text"))).as("signature"))
  }

  /** LSH banding: signature split into `bands` bands of `rows` hashes;
    * docs sharing any band bucket become candidate pairs; candidates are
    * verified with exact shingle Jaccard. The self-join is on
    * (band, bandHash) — bucket-local, never all-pairs. */
  def minHashCandidatePairs(docs: DataFrame, shingleN: Int = 3,
                            bands: Int = 8, rows: Int = 4,
                            threshold: Double = 0.5): DataFrame = {
    val sigs = minHashSignatures(docs, shingleN, bands * rows)
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(slice(col("signature"), b * rows + 1, lit(rows)), b))))
      .toDF("doc_id", "band", "bandHash")
    val a = banded.as("a")
    val b = banded.as("b")
    val cands = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bandHash") === col("b.bandHash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    verifyJaccard(cands, docs, shingleN, threshold)
  }

  /** Exact n-gram Jaccard for given (d1, d2) candidate pairs. */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, shingleN: Int,
                    threshold: Double): DataFrame = {
    val sh = docs.select(col("doc_id"),
      array_distinct(shinglesUdf(shingleN)(col("text"))).as("sh"))
    pairs
      .join(sh.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard", round(col("inter") / greatest(col("uni"), lit(1.0)), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** All-consecutive-pairs 3-gram Jaccard (SQL-oracle-checkable slice of
    * the same verification kernel: pair (d, d+1) for every doc). */
  def consecutiveJaccard(docs: DataFrame, shingleN: Int = 3): DataFrame = {
    val pairs = docs.select(col("doc_id").as("d1"),
      (col("doc_id") + 1).as("d2"))
    verifyJaccard(pairs, docs, shingleN, 0.0)
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit term hash: the first 16 hex chars of md5(term) — i.e. the
    * first 8 digest bytes big-endian. md5 is available bit-identically in
    * Spark, DuckDB and java.security, which makes the whole SimHash
    * pipeline oracle-checkable end-to-end (a seeded MurmurHash3 would be
    * Scala-runtime-only). */
  def termHash64(t: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** 64-bit SimHash over tf-weighted md5 token hashes. */
  val simHashUdf = udf { (text: String) =>
    val toks = Analyzer.tokens(text)
    if (toks.isEmpty) 0L
    else {
      val acc = new Array[Int](64)
      val tf = scala.collection.mutable.HashMap.empty[String, Int]
      toks.foreach(t => tf.update(t, tf.getOrElse(t, 0) + 1))
      tf.foreach { case (t, w) =>
        val h = termHash64(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  def simHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simHashUdf(col("text")).as("simhash"))

  /** Near-dup pairs by SimHash with GUARANTEED recall: the signature is
    * split into `maxHamming + 1` contiguous bands, so by pigeonhole two
    * docs within Hamming distance `maxHamming` agree exactly on at least
    * one band and meet in that band's bucket; Hamming verification runs
    * inside buckets only, so the pair set equals brute force (asserted in
    * OpsSpec). Scale note: band width = 64/(maxHamming+1) bits, and
    * bucket size grows as N/2^width — at 10^9+ docs keep maxHamming <= 3
    * (16-bit bands); wider radii need recursive band splitting. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming")
    val bands = maxHamming + 1
    val base = 64 / bands
    val extra = 64 % bands // first `extra` bands get one extra bit
    val offsets = (0 until bands).scanLeft(0) { (off, b) =>
      off + base + (if (b < extra) 1 else 0)
    }
    val sigs = simHashes(docs)
    val bandStructs = (0 until bands).map { b =>
      val width = base + (if (b < extra) 1 else 0)
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), offsets(b))
          .bitwiseAND(lit(mask)).as("bandKey"))
    }
    val banded = sigs.select(col("doc_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bandKey").as("bandKey"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bandKey") === col("b.bandKey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- near-dup clustering (connected components) ----------------------

  /** Connected components over near-dup pairs — the step that turns
    * pairwise dedup output into KEEP/DROP decisions (cluster id = the
    * component's min doc id; the canonical survivor is the doc whose id
    * equals its cluster).
    *
    * Algorithm: alternating Large-Star / Small-Star (Kiveris, Lattanzi,
    * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
    * and Beyond", SoCC 2014) — converges in O(log^2 n) rounds, and every
    * round is a plain groupBy+join on node keys: no driver-resident graph,
    * no per-round growth, shuffle volume bounded by the (monotonically
    * star-contracting) edge set. This is the 100 TB shape — a label-
    * propagation loop would need O(diameter) rounds and a chain of
    * near-dups (common in boilerplate crawl text) makes diameter large.
    *
    * Each round is `localCheckpoint`ed: the loop would otherwise replay
    * the whole lineage every iteration. Convergence = the canonical edge
    * multiset is unchanged — checked as equal counts (cheap, necessary)
    * plus ONE-directional exceptAll-empty (with equal cardinalities that
    * implies multiset equality; tiny at convergence because the edge set
    * is already star-contracted).
    *
    * Input: pairs with the first two columns = the two node ids (any
    * further columns, e.g. jaccard/hamming scores, are ignored).
    * Output: (doc_id, cluster) for every node that appears in a pair;
    * cluster = min doc_id of its component. Singletons (docs in no pair)
    * are their own implicit cluster and are not emitted. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    def canonical(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()

    /** Large-Star: every node u connects its strictly-LARGER neighbors to
      * m = min(N(u) ∪ {u}) — applied over both edge orientations. */
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      canonical(
        sym.join(mins, "u").filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v")))
    }

    /** Small-Star: every node u connects its SMALLER-or-equal neighbors
      * (and itself) to m = min(N(u) ∪ {u}) over canonical (v < u) edges. */
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("m")) // m < u
      canonical(
        e.join(mins, "u").select(col("v").as("u"), col("m").as("v"))
          .union(mins.select(col("u"), col("m").as("v"))))
    }

    val c0 = pairs.columns
    var edges = canonical(pairs
        .select(col(c0(0)).cast("long").as("u"), col(c0(1)).cast("long").as("v")))
      .localCheckpoint(true)
    var curCount = edges.count()
    var converged = curCount == 0
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // equal counts are NECESSARY for multiset equality — gate the
      // exact check on the cheap count, so early rounds (which almost
      // always change the count) pay one tiny job. Given equal
      // cardinalities, ONE-directional exceptAll-empty already implies
      // multiset equality — the reverse direction would be redundant.
      val nextCount = next.count()
      converged = nextCount == curCount && next.exceptAll(edges).isEmpty
      curCount = nextCount
      edges.unpersist()
      edges = next
      it += 1
    }
    require(converged || it < maxIter,
      s"connectedComponents did not converge in $maxIter rounds")
    // at the fixpoint the edge set is a union of stars (u -> component
    // min); emit both endpoints, roots label themselves
    edges.select(col("u").as("doc_id"), col("v").as("cluster"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("cluster")))
      .groupBy(col("doc_id")).agg(min(col("cluster")).as("cluster"))
  }
}
