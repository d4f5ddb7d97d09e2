package graft.fixtures

import java.sql.Timestamp
import scala.util.Random

import graft.model.Turn

/** Deterministic synthetic transcripts generator (FIXTURES.md §2).
  *
  * Pure: (seed, nConvs) → the same corpus on every run and at every
  * parallelism level — per-conversation RNG streams are seeded
  * independently (`seed * 1000003 + convIdx`), so generation can be
  * distributed with `spark.range(nConvs).flatMap(...)` without any
  * cross-partition state.
  *
  * Planted terms:
  *  - `needlerare`  df = 3            (rarest-first ordering tests)
  *  - `needlemid`   df ≈ 2% of turns  (mid-frequency AND partner)
  *  - `stopish`     df > 90% of turns (must be dropped by the 0.9·N cap —
  *                    reference SearchServiceImpl.java:32,151-154)
  *  - role/tool tokens in every turn's text (hot-term skew fixture)
  *
  * Note tokens are analyzer-closed: `needle_rare` would tokenize into
  * `needle` + `rare`, so planted terms are single alnum words.
  */
object TranscriptGen extends Serializable {

  val Roles = Vector("user", "assistant", "tool")
  val Tools = Vector("", "bash", "read", "write", "search", "")
  val VocabSize = 5000

  /** Zipf-ish rank→weight sampler over w0000..w4999: pick rank via
    * inverse-CDF of 1/(r+1) weights, precomputed. */
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(VocabSize)(r => 1.0 / (r + 1.0))
    val total = w.sum
    val cdf = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def sampleWord(rng: Random): String = {
    val u = rng.nextDouble()
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    f"w$lo%04d"
  }

  /** Multi-byte / whitespace / ё-fold round-trip cases injected verbatim
    * into some turns (FIXTURES.md §2; byte-equality invariant). */
  private val utf8Spice = Vector(
    "  ведущий пример ёлка  ",
    "emoji 😀 payload",
    "\tЁж и еж\t",
    "mixed Ру́сский and english",
  )

  /** Deterministic turns of one conversation. */
  def conversation(seed: Long, convIdx: Long, maxTurns: Int, totalTurnsHint: Long): Seq[Turn] = {
    val rng = new Random(seed * 1000003L + convIdx)
    val convId = f"conv-$convIdx%08d"
    val nTurns = 1 + rng.nextInt(maxTurns)
    (0 until nTurns).map { t =>
      val role = Roles(rng.nextInt(Roles.length))
      val tool = if (role == "tool") Tools(1 + rng.nextInt(Tools.length - 2)) else ""
      val nWords = 5 + rng.nextInt(25)
      val sb = new StringBuilder
      // hot terms in every turn (skew fixture): role + tool family tokens
      sb.append("role").append(role)
      if (tool.nonEmpty) sb.append(" tool").append(tool)
      var i = 0
      while (i < nWords) { sb.append(' ').append(sampleWord(rng)); i += 1 }
      if (rng.nextDouble() < 0.95) sb.append(" stopish")
      if (rng.nextDouble() < 0.02) sb.append(" needlemid")
      if (rng.nextDouble() < 0.03) sb.append(' ').append(utf8Spice(rng.nextInt(utf8Spice.length)))
      // needlerare: planted in exactly 3 fixed (conv, turn) spots below
      val text0 = sb.toString
      val text =
        if (t == 0 && (convIdx == 1L || convIdx == 7L || convIdx == 13L)) text0 + " needlerare"
        else text0
      val ts = new Timestamp(1700000000000L + convIdx * 97000L + t * 1000L)
      Turn(convId, t, role, text, tool, ts)
    }
  }

  /** Whole corpus on the driver (tiny/small scales, tests + oracle). */
  def corpus(seed: Long, nConvs: Int, maxTurns: Int = 8): Vector[Turn] =
    (0L until nConvs.toLong).flatMap(c => conversation(seed, c, maxTurns, 0L)).toVector

  /** Distributed generation for bench scales: one task per conv range. */
  def dataset(spark: org.apache.spark.sql.SparkSession, seed: Long, nConvs: Long,
              maxTurns: Int = 8, partitions: Int = 32): org.apache.spark.sql.Dataset[Turn] = {
    import spark.implicits._
    spark.range(0L, nConvs, 1L, partitions)
      .flatMap(c => conversation(seed, c, maxTurns, 0L))
  }
}
