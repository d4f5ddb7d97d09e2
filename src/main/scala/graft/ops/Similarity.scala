package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Similarity search over an embedding column
  * (`embeddings(vec_id, embedding: array<float>, label)`).
  *
  *  - [[bruteForceTopK]] — exact cosine top-k against one query vector:
  *    a single map + TakeOrderedAndProject; the correctness baseline.
  *  - [[lshTopK]] — random-hyperplane LSH variant: bucket by sign
  *    signature, scan only buckets probed by the query (multi-probe on
  *    Hamming-1 neighbors). The 100 TB path: candidate set shrinks by
  *    ~2^bits, buckets are partition-prunable when the signature is a
  *    partition column.
  *  - [[embeddingNearDupPairs]] — near-duplicate pairs by cosine within
  *    LSH buckets (bucket-local self-join, never all-pairs).
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd builtins, left
  * fold → deterministic summation order) — no UDF on the hot path.
  */
object Similarity {

  /** Deterministic left-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** cosine(a, b) — arrays pre-cast to double by callers. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k by cosine against the vector of `queryId`. */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(asDouble(col("embedding")).as("qv"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(asDouble(col("embedding")), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Seeded random hyperplanes: `bits` × dim sign projections. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-signature column: bit i = [v · h_i > 0]. */
  def signatureUdf(planes: Array[Array[Double]]) = udf { (v: Seq[Double]) =>
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      var s = 0.0
      val p = planes(i)
      var j = 0
      while (j < p.length && j < v.length) { s += p(j) * v(j); j += 1 }
      if (s > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** LSH-bucketed approximate top-k: probe the query's bucket plus all
    * buckets within Hamming distance `probeHamming` (multi-probe LSH),
    * exact cosine within candidates. Recall/cost trades on (bits,
    * probeHamming); bits becomes a partition column at scale so probes
    * are partition-pruned scans. */
  def lshTopK(embeddings: DataFrame, queryId: Long, k: Int,
              bits: Int = 8, dim: Int = 64, probeHamming: Int = 1): DataFrame = {
    val planes = hyperplanes(dim, bits)
    val sig = signatureUdf(planes)
    val withSig = embeddings
      .withColumn("v", asDouble(col("embedding")))
      .withColumn("sig", sig(col("v")))
    val qRow = withSig.filter(col("vec_id") === queryId)
      .select(col("v"), col("sig")).head()
    val qSig = qRow.getLong(1)
    val probes = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
      .map(m => qSig ^ m)
    val q = withSig.sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(qRow.getSeq[Double](0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    withSig.filter(col("sig").isin(probes: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("v"), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Signature of one vector under the seeded hyperplanes (driver-side
    * twin of [[signatureUdf]]). */
  def signatureOf(v: Array[Double], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      var s = 0.0
      val p = planes(i)
      var j = 0
      while (j < p.length && j < v.length) { s += p(j) * v(j); j += 1 }
      if (s > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Materialize the LSH buckets as a REAL partition column: the r01
    * lshTopK filtered an `isin` over a computed sig column, which is a
    * full scan however selective the probes are. Written once, the
    * bucketed table serves every query with PARTITION-pruned reads
    * (only the probed sig dirs are listed/opened — PlanSpec-asserted). */
  def buildLshIndex(embeddings: DataFrame, path: String,
                    bits: Int = 8, dim: Int = 64): Unit = {
    val planes = hyperplanes(dim, bits)
    val sig = signatureUdf(planes)
    embeddings
      .withColumn("sig", sig(asDouble(col("embedding"))))
      .write.mode("overwrite").partitionBy("sig").parquet(path)
  }

  /** Approximate top-k over a bucketed LSH index: the query VECTOR (not
    * an id — a point lookup by id would itself scan) probes its bucket
    * plus Hamming-`probeHamming` neighbors; the scan touches only those
    * partitions. Same scoring as [[lshTopK]]. */
  def lshTopKIndexed(spark: SparkSession, path: String,
                     queryVec: Array[Double], k: Int,
                     bits: Int = 8, dim: Int = 64,
                     probeHamming: Int = 1,
                     excludeVecId: Option[Long] = None): DataFrame = {
    val planes = hyperplanes(dim, bits)
    val qSig = signatureOf(queryVec, planes)
    val probes = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
      .map(m => qSig ^ m)
    val q = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(queryVec.toSeq)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val base = spark.read.parquet(path)
      .filter(col("sig").isin(probes: _*)) // partition pruning
    val filtered = excludeVecId match {
      case Some(id) => base.filter(col("vec_id") =!= id)
      case None => base
    }
    filtered
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(asDouble(col("embedding")), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic IVF coarse quantizer: k-means trained driver-side on a
    * deterministic sample (vec_id-ordered — the trainer is tiny next to
    * the corpus; production trains on a reservoir sample the same way),
    * seeded init = first k sample vectors, FIXED iteration count, ties in
    * assignment broken by centroid index. Deterministic across runs and
    * parallelism levels by construction. */
  def ivfCentroids(embeddings: DataFrame, nCentroids: Int, dim: Int,
                   iters: Int = 8, sampleN: Int = 2048): Array[Array[Double]] = {
    val sample = embeddings.orderBy(col("vec_id")).limit(sampleN)
      .select(asDouble(col("embedding")))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= nCentroids, s"sample ${sample.length} < $nCentroids")
    var cents = Array.tabulate(nCentroids)(i => sample(i).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nCentroids)(new Array[Double](dim))
      val counts = new Array[Long](nCentroids)
      sample.foreach { v =>
        val c = nearestCentroid(v, cents)
        counts(c) += 1
        var j = 0
        while (j < dim && j < v.length) { sums(c)(j) += v(j); j += 1 }
      }
      cents = Array.tabulate(nCentroids) { c =>
        if (counts(c) == 0) cents(c) // empty cluster keeps its centroid
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    cents
  }

  /** Index of the nearest centroid by L2 (ties → smallest index). */
  def nearestCentroid(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      val ct = cents(c)
      while (j < ct.length && j < v.length) {
        val x = v(j) - ct(j); d += x * x; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF approximate top-k: assign every vector to its nearest centroid
    * (the `cell` column — a partition/bucket key at scale), probe the
    * `nProbe` centroids nearest to the query, exact cosine within the
    * probed cells. `nProbe == nCentroids` degrades gracefully to EXACT
    * brute force (used by the oracle gate); recall at partial probing is
    * pinned in OpsSpec. */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              dim: Int = 64): DataFrame = {
    val cents = ivfCentroids(embeddings, nCentroids, dim)
    val bc = embeddings.sparkSession.sparkContext.broadcast(cents)
    val cellUdf = udf { (v: Seq[Double]) =>
      nearestCentroid(v.toArray, bc.value)
    }
    val withCell = embeddings
      .withColumn("v", asDouble(col("embedding")))
      .withColumn("cell", cellUdf(col("v")))
    val qRow = withCell.filter(col("vec_id") === queryId)
      .select(col("v")).head()
    val qv = qRow.getSeq[Double](0).toArray
    val probeCells = cents.indices
      .sortBy { c =>
        var d = 0.0
        var j = 0
        while (j < cents(c).length && j < qv.length) {
          val x = qv(j) - cents(c)(j); d += x * x; j += 1
        }
        (d, c)
      }
      .take(math.max(1, nProbe))
    val q = withCell.sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(qv.toSeq)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    withCell.filter(col("cell").isin(probeCells: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("v"), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Near-duplicate vector pairs: cosine >= threshold within LSH buckets,
    * with Hamming-`probeHamming` multi-probe on one join side — a pair on
    * a hyperplane boundary (signatures differing in <= probeHamming bits)
    * is still generated exactly once, because the XOR mask that matches it
    * is unique per pair. Approximation contract: pairs whose signatures
    * differ in MORE than `probeHamming` bits are missed; recall against
    * brute-force cosine is asserted in OpsSpec. The join stays bucket-
    * local (fan-out × #masks, never all-pairs). */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double,
                            bits: Int = 8, dim: Int = 64,
                            probeHamming: Int = 1): DataFrame = {
    val planes = hyperplanes(dim, bits)
    val sig = signatureUdf(planes)
    val withSig = embeddings
      .withColumn("v", asDouble(col("embedding")))
      .withColumn("sig", sig(col("v")))
      .select(col("vec_id"), col("v"), col("sig"))
    val masks = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
    val probed = withSig.withColumn("psig",
      explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)))
    val a = withSig.as("a")
    val b = probed.as("b")
    a.join(b, col("a.sig") === col("b.psig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        round(cosine(col("a.v"), col("b.v")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
