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

  def assign(spark: SparkSession, turns: Dataset[Turn], partitions: Int = 0): Dataset[Doc] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = turns
      .repartitionByRange(p, $"conv_id", $"turn_idx")
      .sortWithinPartitions($"conv_id", $"turn_idx")

    // Job A: per-partition counts (cheap: count only, no data movement).
    val counts: Map[Int, Long] = sorted
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator((pid, n))
      }
      .collect()
      .toMap

    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var i = 0
    while (i < nParts) {
      offsets(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)

    // Job B: assign ids; shuffle from job A is reused (skipped stages).
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var local = bOffsets.value(pid)
      it.map { t =>
        val id = local
        local += 1
        Doc(id, t.conv_id, t.turn_idx, t.role, t.text, t.tool,
            Analyzer.tokens(t.text).length)
      }
    }
  }

  /** As [[assign]], plus `shard` = the range-partition id. Each shard is a
    * CONTIGUOUS docId range by construction (range partitioning + in-
    * partition dense assignment), and a `partitionBy("shard")` write needs
    * no further shuffle — each task owns exactly one shard
    * (IndexBuilder's single-wide-shuffle build depends on this). */
  def assignWithShard(spark: SparkSession, turns: Dataset[Turn],
                      shards: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    assign(spark, turns, shards)
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        it.map(d => (d.docId, d.conv_id, d.turn_idx, d.role, d.text, d.tool,
          d.dl, pid))
      }
      .toDF("docId", "conv_id", "turn_idx", "role", "text", "tool", "dl", "shard")
  }
}
