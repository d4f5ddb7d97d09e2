package graft.index

import org.apache.spark.TaskContext
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
  * Scale-safe plan (§7.4), two jobs over one shuffle:
  *
  *   1. `repartitionByRange(conv_id, turn_idx)` + `sortWithinPartitions`
  *      → globally range-ordered partitions (shuffle #1 of the build).
  *   2. job A: per-partition row counts → driver prefix-sum → offsets.
  *   3. job B: `mapPartitions` assigns `offset(pid) + localIndex`.
  *
  * Job B reuses job A's shuffle files (same plan object → skipped stages),
  * so the input is shuffled exactly once. Deterministic for a fixed input
  * because (conv_id, turn_idx) is a unique key and range boundaries are a
  * pure function of the sampled key distribution.
  *
  * Document length `dl` (BM25 norm) is computed here in the same pass so
  * the text is tokenized once per doc on this path.
  */
object DocIdAssigner {

  /** Deterministic per-row fingerprint hash — MUST stay identical to
    * [[rowHashUdfBody]] (the resume path recomputes it from docs/). */
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

  def assign(spark: SparkSession, turns: Dataset[Turn], partitions: Int = 0): Dataset[Doc] =
    assignWithStats(spark, turns, partitions)._1

  def assignWithStats(spark: SparkSession, turns: Dataset[Turn],
                      partitions: Int = 0): (Dataset[Doc], AssignStats) = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = turns
      .repartitionByRange(p, $"conv_id", $"turn_idx")
      .sortWithinPartitions($"conv_id", $"turn_idx")

    // Job A: per-partition counts + corpus fingerprint in the same pass
    // (one fewer driver-serial job than counting and fingerprinting
    // separately; the xor-fold is order-independent).
    val perPart = sorted
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var n = 0L
        var h = 0L
        while (it.hasNext) {
          val t = it.next()
          n += 1
          h ^= rowHash(t.conv_id, t.turn_idx, t.text)
        }
        Iterator((pid, n, h))
      }
      .collect()
    val counts: Map[Int, Long] = perPart.map(x => x._1 -> x._2).toMap

    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var i = 0
    while (i < nParts) {
      offsets(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }
    val ranges = counts.collect { case (pid, c) if c > 0 =>
      pid -> (offsets(pid), offsets(pid) + c - 1)
    }.toMap
    val stats = AssignStats(perPart.map(_._2).sum,
      s"${perPart.map(_._2).sum}-${perPart.map(_._3).foldLeft(0L)(_ ^ _)}",
      ranges)
    val bOffsets = spark.sparkContext.broadcast(offsets)

    // Job B: assign ids; shuffle from job A is reused (skipped stages).
    val docs = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var local = bOffsets.value(pid)
      it.map { t =>
        val id = local
        local += 1
        Doc(id, t.conv_id, t.turn_idx, t.role, t.text, t.tool,
            Analyzer.tokens(t.text).length)
      }
    }
    (docs, stats)
  }

  /** As [[assign]], plus `shard` = the range-partition id. Each shard is a
    * CONTIGUOUS docId range by construction (range partitioning + in-
    * partition dense assignment), and a `partitionBy("shard")` write needs
    * no further shuffle — each task owns exactly one shard
    * (IndexBuilder's single-wide-shuffle build depends on this). */
  def assignWithShard(spark: SparkSession, turns: Dataset[Turn],
                      shards: Int): (org.apache.spark.sql.DataFrame, AssignStats) = {
    import spark.implicits._
    val (docs, stats) = assignWithStats(spark, turns, shards)
    val df = docs
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        it.map(d => (d.docId, d.conv_id, d.turn_idx, d.role, d.text, d.tool,
          d.dl, pid))
      }
      .toDF("docId", "conv_id", "turn_idx", "role", "text", "tool", "dl", "shard")
    (df, stats)
  }
}
