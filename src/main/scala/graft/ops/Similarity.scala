package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
