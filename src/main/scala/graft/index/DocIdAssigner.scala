package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.model.{Doc, Turn}

/** Stable docId assignment: docId = dense rank of (conv_id ASC, turn_idx ASC)
  * (FIXTURES.md §1; replaces the reference's auto-increment page.id,
  * model/PageEntity.java:18-21).
  *
  * A naive `row_number().over(Window.orderBy(...))` funnels 10^12 rows
  * through ONE partition (SURVEY.md §2.5 W2) — the classic global-sort trap.
  *
  * Scale-safe AND replay-safe plan (§7.4). The r01 design used
  * `repartitionByRange` + two passes over "the same" shuffle — but each
  * Dataset ACTION replans the exchange and re-SAMPLES the range
  * boundaries, so the counting pass and the assignment pass could see
  * DIFFERENT partitionings once the corpus outgrew the sample (duplicate
  * + missing docIds near shard boundaries at millions of rows; caught by
  * a 4.5M-doc probe). The fix moves the grouping key INTO the data:
  *
  *   1. one pass samples keys deterministically (row-hash filter, fixed
  *      modulus) → the driver derives RANGE BOUNDARIES once;
  *   2. every row gets a `pid` column = binary search of its key in the
  *      broadcast boundaries — a pure function of the ROW, not of any
  *      physical plan;
  *   3. `repartition(col("pid"))` + sortWithinPartitions(pid, key): both
  *      subsequent jobs (per-pid counts+fingerprint; docId assignment)
  *      are deterministic functions of row values, so ANY recomputation
  *      — replayed stages, different job plans, task retries — yields
  *      identical docIds.
  *
  * Document length `dl` (BM25 norm) is computed in the same pass so the
  * text is tokenized once per doc on this path.
  */
object DocIdAssigner {

  /** Deterministic per-row fingerprint hash — MUST stay identical to
    * the resume path's recompute (IndexBuilder reads docs/ back). */
  def rowHash(convId: String, turnIdx: Int, text: String): Long = {
    import scala.util.hashing.MurmurHash3
    val a = MurmurHash3.stringHash(text, MurmurHash3.stringHash(convId, turnIdx))
    val b = MurmurHash3.stringHash(convId, MurmurHash3.stringHash(text, turnIdx ^ 0x5bd1e995))
    (a.toLong << 32) | (b.toLong & 0xffffffffL)
  }

  /** `ranges(pid)` = (first, last) docId of range-partition `pid` (only
    * non-empty partitions present) — free from the offsets prefix-sum; the
    * build stamps them into the manifest as shard docId ranges. */
  final case class AssignStats(nDocs: Long, fingerprint: String,
                               ranges: Map[Int, (Long, Long)] = Map.empty)

  /** Range boundaries from a deterministic sample: every key whose hash
    * is ≡ 0 mod `sampleMod` is collected (uniform over keys, independent
    * of physical layout), sorted, and p-1 quantiles taken. ≤ p-1 distinct
    * boundaries; duplicates collapse (fewer effective partitions). */
  private def sampleBoundaries(turns: Dataset[Turn], n: Long,
                               p: Int): Array[(String, Int)] = {
    import turns.sparkSession.implicits._
    if (p <= 1 || n == 0) return Array.empty
    // target ~200 sampled keys per partition
    val sampleMod = math.max(1L, n / math.max(1L, p.toLong * 200L))
    val keys = turns
      .filter(pmod(xxhash64($"conv_id", $"turn_idx"), lit(sampleMod)) === 0)
      .select($"conv_id", $"turn_idx")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .sorted
    if (keys.isEmpty) return Array.empty
    (1 until p).map { i =>
      keys(math.min(keys.length - 1, i * keys.length / p))
    }.distinct.toArray
  }

  /** pid = number of boundaries <= key (binary search). */
  private def pidOf(boundaries: Array[(String, Int)],
                    convId: String, turnIdx: Int): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val b = boundaries(mid)
      val cmp = {
        val c = convId.compareTo(b._1)
        if (c != 0) c else Integer.compare(turnIdx, b._2)
      }
      if (cmp >= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  def assign(spark: SparkSession, turns: Dataset[Turn], partitions: Int = 0): Dataset[Doc] =
    assignWithStats(spark, turns, partitions)._1

  def assignWithStats(spark: SparkSession, turns: Dataset[Turn],
                      partitions: Int = 0): (Dataset[Doc], AssignStats) = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val n = turns.count() // parquet sources answer from footers
    val boundaries = sampleBoundaries(turns, n, p)
    val bB = spark.sparkContext.broadcast(boundaries)
    val pidUdf = udf((c: String, t: Int) => pidOf(bB.value, c, t))
    val nPids = boundaries.length + 1

    val parted = turns
      .withColumn("pid", pidUdf($"conv_id", $"turn_idx"))
      .repartition(nPids, $"pid")
      .sortWithinPartitions($"pid", $"conv_id", $"turn_idx")

    // Job A: per-PID counts + corpus fingerprint in one pass. Keyed by the
    // pid COLUMN (not the physical partition id), so the result is
    // identical however the stages replay.
    val perPid = parted
      .mapPartitions { it =>
        val counts = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, Long)]
        it.foreach { r =>
          val pid = r.getInt(6)
          val h = rowHash(r.getString(0), r.getInt(1), r.getString(3))
          val (c0, h0) = counts.getOrElse(pid, (0L, 0L))
          counts.update(pid, (c0 + 1, h0 ^ h))
        }
        counts.iterator.map { case (pid, (c, h)) => (pid, c, h) }
      }
      .collect()
    val counts: Map[Int, Long] = perPid.map(x => x._1 -> x._2).toMap

    val offsets = new Array[Long](nPids)
    var acc = 0L
    var i = 0
    while (i < nPids) {
      offsets(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }
    val ranges = counts.collect { case (pid, c) if c > 0 =>
      pid -> (offsets(pid), offsets(pid) + c - 1)
    }.toMap
    val stats = AssignStats(perPid.map(_._2).sum,
      s"${perPid.map(_._2).sum}-${perPid.map(_._3).foldLeft(0L)(_ ^ _)}",
      ranges)
    val bOffsets = spark.sparkContext.broadcast(offsets)

    // Job B: assign ids — also keyed by the pid column; rows within a
    // partition are (pid, key)-sorted, so the running index per pid is a
    // pure function of row values.
    val docs = parted.mapPartitions { it =>
      var curPid = -1
      var next = 0L
      it.map { r =>
        val pid = r.getInt(6)
        if (pid != curPid) { curPid = pid; next = bOffsets.value(pid) }
        val id = next
        next += 1
        Doc(id, r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
          r.getString(4), Analyzer.tokens(r.getString(3)).length)
      }
    }
    (docs, stats)
  }

  /** As [[assign]], plus `shard` = the pid (range bucket). Each shard is a
    * CONTIGUOUS docId range by construction (range bucketing + in-bucket
    * dense assignment), and a `partitionBy("shard")` write needs no
    * further shuffle — each task owns whole shards
    * (IndexBuilder's single-wide-shuffle build depends on this). */
  def assignWithShard(spark: SparkSession, turns: Dataset[Turn],
                      shards: Int): (org.apache.spark.sql.DataFrame, AssignStats) = {
    import spark.implicits._
    val p = if (shards > 0) shards
            else spark.sessionState.conf.numShufflePartitions
    val n = turns.count()
    val boundaries = sampleBoundaries(turns, n, p)
    val bB = spark.sparkContext.broadcast(boundaries)
    val pidUdf = udf((c: String, t: Int) => pidOf(bB.value, c, t))
    val nPids = boundaries.length + 1

    val parted = turns
      .withColumn("pid", pidUdf($"conv_id", $"turn_idx"))
      .repartition(nPids, $"pid")
      .sortWithinPartitions($"pid", $"conv_id", $"turn_idx")

    val perPid = parted
      .mapPartitions { it =>
        val counts = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, Long)]
        it.foreach { r =>
          val pid = r.getInt(6)
          val h = rowHash(r.getString(0), r.getInt(1), r.getString(3))
          val (c0, h0) = counts.getOrElse(pid, (0L, 0L))
          counts.update(pid, (c0 + 1, h0 ^ h))
        }
        counts.iterator.map { case (pid, (c, h)) => (pid, c, h) }
      }
      .collect()
    val counts: Map[Int, Long] = perPid.map(x => x._1 -> x._2).toMap
    val offsets = new Array[Long](nPids)
    var acc = 0L
    var i = 0
    while (i < nPids) {
      offsets(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }
    val ranges = counts.collect { case (pid, c) if c > 0 =>
      pid -> (offsets(pid), offsets(pid) + c - 1)
    }.toMap
    val stats = AssignStats(perPid.map(_._2).sum,
      s"${perPid.map(_._2).sum}-${perPid.map(_._3).foldLeft(0L)(_ ^ _)}",
      ranges)
    val bOffsets = spark.sparkContext.broadcast(offsets)

    val df = parted.mapPartitions { it =>
      var curPid = -1
      var next = 0L
      it.map { r =>
        val pid = r.getInt(6)
        if (pid != curPid) { curPid = pid; next = bOffsets.value(pid) }
        val id = next
        next += 1
        (id, r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
          r.getString(4), Analyzer.tokens(r.getString(3)).length, pid)
      }
    }.toDF("docId", "conv_id", "turn_idx", "role", "text", "tool", "dl", "shard")
    (df, stats)
  }
}
