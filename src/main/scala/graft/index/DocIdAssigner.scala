package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  *      modulus) → the driver derives RANGE BOUNDARIES once, compared in
  *      UTF-8 byte order (= Spark's UTF8String binary sort order — Java
  *      String.compareTo is UTF-16 code-unit order and disagrees for
  *      supplementary-plane vs U+E000–U+FFFF keys);
  *   2. every row gets a `pid` column = binary search of its key in the
  *      broadcast boundaries — a pure function of the ROW, not of any
  *      physical plan;
  *   3. shuffle on a STEERED key (`pkey`): for each pid the driver
  *      pre-computes an int j with pmod(murmur3(j, 42), nPids) == pid, so
  *      `repartition(nPids, $"pkey")` maps each range bucket to EXACTLY
  *      one task. (Hashing the raw pid would strand ~1/e of the tasks
  *      empty and pile 2-3 whole buckets on others — same correctness,
  *      up to ~3× the intended per-task work/memory.) Both downstream
  *      jobs (per-pid counts+fingerprint; docId assignment) stay keyed by
  *      the pid COLUMN, so any recomputation — replayed stages, different
  *      job plans, task retries — yields identical docIds even if the
  *      steering assumption ever broke.
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

  /** Unsigned lexicographic UTF-8 byte comparison — matches Spark's
    * UTF8String binary ordering exactly (which `sortWithinPartitions`
    * uses), unlike String.compareTo (UTF-16 code units). */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    java.util.Arrays.compareUnsigned(x, y)
  }

  private val keyOrdering: Ordering[(String, Int)] = new Ordering[(String, Int)] {
    def compare(a: (String, Int), b: (String, Int)): Int = {
      val c = utf8Compare(a._1, b._1)
      if (c != 0) c else Integer.compare(a._2, b._2)
    }
  }

  /** `ranges(shard)` = (first, last) docId of shard (only non-empty
    * shards present) — free from the offsets prefix-sum; the build stamps
    * them into the manifest as shard docId ranges. `convRanges(shard)` =
    * (min, max) conv_id of the shard in UTF-8 order (rows are range-
    * bucketed BY conv key, so these fall out of the same counting pass) —
    * stamped into the manifest so later key-existence checks prune to
    * intersecting shards instead of scanning the corpus. */
  final case class AssignStats(nDocs: Long, fingerprint: String,
                               ranges: Map[Int, (Long, Long)] = Map.empty,
                               convRanges: Map[Int, (String, String)] = Map.empty)

  /** p-1 quantile boundaries from a SORTED key sample; duplicates
    * collapse (fewer effective partitions). Shared by docId assignment
    * and the dictionary rank (EntryQueries.o1DfOrder) — the two-phase
    * global-rank scaffold must exist in one copy. */
  private[graft] def quantileBoundaries[K](sortedKeys: IndexedSeq[K],
                                           p: Int): Vector[K] =
    if (sortedKeys.isEmpty || p <= 1) Vector.empty
    else (1 until p).map { i =>
      sortedKeys(math.min(sortedKeys.length - 1, i * sortedKeys.length / p))
    }.distinct.toVector

  /** bucket = number of boundaries <= key (binary search under `ord`) —
    * a pure function of the key, never of any physical plan. */
  private[graft] def bucketOf[K](boundaries: IndexedSeq[K], key: K)
                                (implicit ord: Ordering[K]): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.gteq(key, boundaries(mid))) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Prefix-sum offsets per bucket: offsets(i) = base + Σ counts(<i). */
  private[graft] def prefixOffsets(counts: Map[Int, Long], nPids: Int,
                                   base: Long): Array[Long] = {
    val offsets = new Array[Long](nPids)
    var acc = base
    var i = 0
    while (i < nPids) {
      offsets(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }
    offsets
  }

  /** Range boundaries from a deterministic sample: every key whose hash
    * is ≡ 0 mod `sampleMod` is collected (uniform over keys, independent
    * of physical layout), sorted in UTF-8 order, and p-1 quantiles taken. */
  private def sampleBoundaries(turns: Dataset[Turn], n: Long,
                               p: Int): Vector[(String, Int)] = {
    import turns.sparkSession.implicits._
    if (p <= 1 || n == 0) return Vector.empty
    // target ~200 sampled keys per partition
    val sampleMod = math.max(1L, n / math.max(1L, p.toLong * 200L))
    val keys = turns
      .filter(pmod(xxhash64($"conv_id", $"turn_idx"), lit(sampleMod)) === 0)
      .select($"conv_id", $"turn_idx")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .sorted(keyOrdering)
    quantileBoundaries(keys.toIndexedSeq, p)
  }

  /** Shuffle-key steering: keys(pid) = the smallest int j whose Spark
    * hash-partition slot among nPids is exactly pid, i.e.
    * pmod(Murmur3_x86_32.hashInt(j, 42), nPids) == pid — the same
    * function `repartition(nPids, $"pkey")` applies to an IntegerType
    * column (HashPartitioning: Pmod(Murmur3Hash(expr, seed=42), n)).
    * Expected search cost is nPids·H(nPids) probes (coupon collector) on
    * the driver. Pinned by DocIdIntegritySpec's steering test so a Spark
    * upgrade that changes the hash shows up as a test failure, not a
    * silent balance regression. */
  private[graft] def steeringKeys(nPids: Int): Array[Int] = {
    val keys = new Array[Int](nPids)
    val found = new Array[Boolean](nPids)
    var remaining = nPids
    var j = 0
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(j, 42)
      val pid = ((h % nPids) + nPids) % nPids
      if (!found(pid)) { found(pid) = true; keys(pid) = j; remaining -= 1 }
      j += 1
    }
    keys
  }

  /** The single assignment pass shared by fresh builds and appends
    * (docId-integrity logic must exist in exactly one copy).
    *
    * INPUT CONTRACT: `turns` must be VALUE-deterministic across
    * re-evaluation — this pass runs several jobs over it (count, boundary
    * sample, per-pid counts, assignment) and rows that differ between
    * jobs would silently collide docId offsets. Storage-table reads
    * qualify; derived frames with nondeterministic survivors (e.g.
    * dropDuplicates) must be pinned first (appendConversationsDs
    * localCheckpoints its batch for exactly this reason). Returns
    * rows (docId, conv_id, turn_idx, role, text, tool, dl, shard) with
    * docId = baseDocId + dense rank of (conv_id, turn_idx) within
    * `turns`, and shard = baseShard + range-bucket id (each shard is a
    * CONTIGUOUS docId range by construction, so a `partitionBy("shard")`
    * write needs no further shuffle — each task owns whole shards). */
  private[graft] def assignCore(spark: SparkSession, turns: Dataset[Turn],
                                buckets: Int, baseDocId: Long = 0L,
                                baseShard: Int = 0): (DataFrame, AssignStats) = {
    import spark.implicits._
    val p = if (buckets > 0) buckets
            else spark.sessionState.conf.numShufflePartitions
    val n = turns.count() // parquet sources answer from footers
    val boundaries = sampleBoundaries(turns, n, p)
    val nPids = boundaries.length + 1
    val bB = spark.sparkContext.broadcast(boundaries)
    val bSteer = spark.sparkContext.broadcast(steeringKeys(nPids))
    val pidUdf = udf((c: String, t: Int) =>
      bucketOf(bB.value, (c, t))(keyOrdering))
    val pkeyUdf = udf((pid: Int) => bSteer.value(pid))

    // Turn fields land at ordinals 0-5, pid at 6, pkey at 7.
    val parted = turns
      .withColumn("pid", pidUdf($"conv_id", $"turn_idx"))
      .withColumn("pkey", pkeyUdf($"pid"))
      .repartition(nPids, $"pkey")
      .sortWithinPartitions($"pid", $"conv_id", $"turn_idx")

    // Job A: per-PID counts + corpus fingerprint + conv bounds in one
    // pass. Keyed by the pid COLUMN (not the physical partition id), so
    // the result is identical however the stages replay. Rows arrive
    // (pid, conv, turn)-sorted, so the first/last conv seen per pid ARE
    // its UTF-8 min/max.
    val perPid = parted
      .mapPartitions { it =>
        val counts = scala.collection.mutable.LinkedHashMap
          .empty[Int, (Long, Long, String, String)]
        it.foreach { r =>
          val pid = r.getInt(6)
          val conv = r.getString(0)
          val h = rowHash(conv, r.getInt(1), r.getString(3))
          counts.get(pid) match {
            case None => counts.update(pid, (1L, h, conv, conv))
            case Some((c0, h0, mn, _)) => counts.update(pid, (c0 + 1, h0 ^ h, mn, conv))
          }
        }
        counts.iterator.map { case (pid, (c, h, mn, mx)) => (pid, c, h, mn, mx) }
      }
      .collect()
    val counts: Map[Int, Long] = perPid.map(x => x._1 -> x._2).toMap

    val offsets = prefixOffsets(counts, nPids, baseDocId)
    val ranges = counts.collect { case (pid, c) if c > 0 =>
      (baseShard + pid) -> (offsets(pid), offsets(pid) + c - 1)
    }.toMap
    val convRanges = perPid.collect { case (pid, c, _, mn, mx) if c > 0 =>
      (baseShard + pid) -> (mn, mx)
    }.toMap
    val stats = AssignStats(perPid.map(_._2).sum,
      s"${perPid.map(_._2).sum}-${perPid.map(_._3).foldLeft(0L)(_ ^ _)}",
      ranges, convRanges)
    val bOffsets = spark.sparkContext.broadcast(offsets)

    // Job B: assign ids — also keyed by the pid column; rows within a
    // partition are (pid, key)-sorted, so the running index per pid is a
    // pure function of row values.
    val shardBase = baseShard
    val df = parted.mapPartitions { it =>
      var curPid = -1
      var next = 0L
      it.map { r =>
        val pid = r.getInt(6)
        if (pid != curPid) { curPid = pid; next = bOffsets.value(pid) }
        val id = next
        next += 1
        (id, r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
          r.getString(4), Analyzer.tokens(r.getString(3)).length, shardBase + pid,
          // ts rides into the docs table (r7: typed ts-range filters map
          // to docId segments via a pushed-down docs-column predicate;
          // parquet row-group min/max stats on ts are the prune)
          r.getTimestamp(5))
      }
    }.toDF("docId", "conv_id", "turn_idx", "role", "text", "tool", "dl",
      "shard", "ts")
    (df, stats)
  }

  def assign(spark: SparkSession, turns: Dataset[Turn], partitions: Int = 0): Dataset[Doc] =
    assignWithStats(spark, turns, partitions)._1

  def assignWithStats(spark: SparkSession, turns: Dataset[Turn],
                      partitions: Int = 0): (Dataset[Doc], AssignStats) = {
    import spark.implicits._
    val (df, stats) = assignCore(spark, turns, partitions)
    (df.drop("shard").as[Doc], stats)
  }

  /** As [[assign]], plus `shard` = the range bucket (IndexBuilder's
    * single-wide-shuffle build depends on shard↔docId-range contiguity). */
  def assignWithShard(spark: SparkSession, turns: Dataset[Turn],
                      shards: Int): (DataFrame, AssignStats) =
    assignCore(spark, turns, shards)
}
