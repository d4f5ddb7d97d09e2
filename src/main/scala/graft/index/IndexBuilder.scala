package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.model.{CorpusStats, Doc, PostingList, TermStats, Turn}

/** Distributed inverted-index build (SURVEY.md §3.2 Spark equivalent,
  * §4.4, §7.2 steps 4-7).
  *
  * Pipeline (exactly two wide shuffles on the hot path, plus the stats
  * aggregations):
  *
  *   transcripts
  *     → DocIdAssigner (shuffle #1: range-repartition by (conv_id, turn_idx))
  *     → docs/          (docId, dl, text … — page-table analog)
  *     → explode(tokens) → groupBy(docId, term).count
  *     → tf/            (docId, term, tf, dl, shard — search_index analog,
  *                       also the build checkpoint: resume never re-tokenizes)
  *     → term_stats/    (skew-safe two-phase df agg: salt → partial → final)
  *     → repartition by docId-range `shard` (shuffle #2)
  *        + sortWithinPartitions(shard, term, docId)
  *     → streaming delta+varint encode per (shard, term) in mapPartitions
  *     → postings/shard=K/ parquet  + manifest-vN.json commit
  *
  * Layout choice: postings are DOCUMENT-RANGE sharded — every shard holds
  * the posting lists of ALL terms restricted to its docId range (the
  * Lucene/ES shard design). AND-intersection and WAND then run fully
  * shard-local with a driver-side top-k merge; no per-query shuffle.
  * Hot terms (`roleuser`-class tokens, df ≈ N — FIXTURES.md §2) split
  * naturally across shards, and any list still longer than
  * `maxChunkPostings` within a shard is chunked so no single blob row is
  * unbounded. The alternative term-hash layout would prune single-term
  * lookups to one partition but makes multi-term intersection a shuffle;
  * term-df lookups here are served by the (tiny, broadcastable) term_stats
  * table instead, and parquet min/max stats on the sorted `term` column
  * skip non-matching row groups inside each shard.
  *
  * Resume (north rule: "checkpointed per partition with lineage +
  * per-partition metrics so a killed run resumes without recomputation"):
  * docs/ and tf/ are stage checkpoints (skipped when `_SUCCESS` exists and
  * the fingerprint matches); posting shards are built in WAVES, with a
  * manifest snapshot committed after each wave — a kill between waves
  * loses at most one wave, and completed shards are never recomputed.
  */
object IndexBuilder {

  val DefaultShards = 32
  /** Max postings per blob row; 2^17 ≈ 130k postings ≈ ~300 KB encoded. */
  val MaxChunkPostings: Int = 1 << 17
  /** Salt fan-out for the two-phase df aggregation (hot-term skew). */
  val DfSalts = 16

  final case class Paths(root: String) {
    val docs = s"$root/docs"
    val tf = s"$root/tf"
    val termStats = s"$root/term_stats"
    val postings = s"$root/postings"
  }

  final case class BuiltIndex(root: String, manifest: Manifest) {
    val paths: Paths = Paths(root)
    def stats: CorpusStats =
      CorpusStats(manifest.nDocs, manifest.avgdl, manifest.analyzerVersion)
  }

  private def hasSuccess(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))

  private val timing = sys.env.get("GRAFT_BUILD_TIMING").contains("1")
  private def timed[A](stage: String)(f: => A): A = {
    if (!timing) f
    else {
      val t0 = System.nanoTime()
      val a = f
      System.err.println(f"[build-timing] $stage: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }
  }

  /** Tokenizer exposed as a UDF (SURVEY.md §2.8 U2). */
  def tokensUdf = udf((text: String) => Analyzer.tokens(text))

  /** Per-shard (terms, postings, bytes) metrics collected by the encode
    * tasks themselves via an accumulator — saves the post-write read job
    * (a serial overhead locally, a full postings re-scan on a cluster). */
  final class ShardMetricsAcc
      extends org.apache.spark.util.AccumulatorV2[
        (Int, Long, Long, Long), Map[Int, (Long, Long, Long)]] {
    private val m = scala.collection.mutable.HashMap.empty[Int, (Long, Long, Long)]
    override def isZero: Boolean = m.isEmpty
    override def copy(): ShardMetricsAcc = {
      val c = new ShardMetricsAcc; c.m ++= m; c
    }
    override def reset(): Unit = m.clear()
    override def add(v: (Int, Long, Long, Long)): Unit = {
      val (shard, t, p, b) = v
      val (t0, p0, b0) = m.getOrElse(shard, (0L, 0L, 0L))
      m.update(shard, (t0 + t, p0 + p, b0 + b))
    }
    override def merge(other: org.apache.spark.util.AccumulatorV2[
        (Int, Long, Long, Long), Map[Int, (Long, Long, Long)]]): Unit =
      other.value.foreach { case (s, (t, p, b)) => add((s, t, p, b)) }
    override def value: Map[Int, (Long, Long, Long)] = m.toMap
  }

  def build(spark: SparkSession, turns: Dataset[Turn], root: String,
            shards: Int = DefaultShards, waveSize: Int = 16,
            maxChunkPostings: Int = MaxChunkPostings): BuiltIndex = {
    import spark.implicits._
    val P = Paths(root)

    // ---- stage 1: docs (docId assignment) ----------------------------
    if (!hasSuccess(P.docs)) timed("docs") {
      DocIdAssigner.assign(spark, turns)
        .write.mode(SaveMode.Overwrite).parquet(P.docs)
    }
    val docs = spark.read.parquet(P.docs).as[Doc]

    // corpus stats + input fingerprint in one pass
    val srow = timed("corpus-stats")(docs.agg(
      count(lit(1)).as("n"),
      avg($"dl".cast("double")).as("avgdl"),
      // bit_xor: order-independent and overflow-free (ANSI mode rejects
      // overflowing sum(hash))
      expr("bit_xor(xxhash64(conv_id, turn_idx, text))").as("fp")).head())
    val nDocs = srow.getLong(0)
    val avgdl = srow.getDouble(1)
    val fingerprint = s"$nDocs-${srow.getLong(2)}"
    val shardSize = math.max(1L, (nDocs + shards - 1) / shards)

    // resume check: same input already fully indexed → no-op
    IndexManifest.read(root) match {
      case Some(m) if m.inputFingerprint == fingerprint &&
          m.analyzerVersion == Analyzer.Version &&
          m.completedShards.size >= shards =>
        return BuiltIndex(root, m)
      case Some(m) if m.inputFingerprint != fingerprint ||
          m.analyzerVersion != Analyzer.Version =>
        // input or analyzer changed → stale checkpoints are invalid
        throw new IllegalStateException(
          s"index at $root was built from different input/analyzer " +
          s"(${m.inputFingerprint}/${m.analyzerVersion} vs " +
          s"$fingerprint/${Analyzer.Version}); use a fresh root")
      case _ => ()
    }

    // ---- stage 2: tf (uncompressed logical index + checkpoint) -------
    if (!hasSuccess(P.tf)) timed("tf") {
      docs.select($"docId", $"dl", explode(tokensUdf($"text")).as("term"))
        .groupBy($"docId", $"term")
        .agg(count(lit(1)).cast("int").as("tf"), first($"dl").as("dl"))
        .withColumn("shard", ($"docId" / lit(shardSize)).cast("int"))
        .write.mode(SaveMode.Overwrite).parquet(P.tf)
    }
    val tf = spark.read.parquet(P.tf)

    // ---- stage 3: term stats — explicit two-phase (salted) df agg ----
    // A single groupBy(term) would funnel each hot term's ~N rows into
    // one reducer; the salt splits a hot term across DfSalts reducers
    // first (north rule: skew-aware salting for role/tool-class tokens).
    if (!hasSuccess(P.termStats)) timed("term-stats") {
      tf.groupBy($"term", pmod(xxhash64($"docId"), lit(DfSalts)).as("salt"))
        .agg(count(lit(1)).as("pdf"), max($"tf").as("pmax"))
        .groupBy($"term")
        .agg(sum($"pdf").as("df"), max($"pmax").as("maxTf"))
        .select($"term", $"df", $"maxTf".cast("int").as("maxTf"))
        .write.mode(SaveMode.Overwrite).parquet(P.termStats)
    }

    // ---- stage 4: posting shards, in resumable waves ------------------
    val done = IndexManifest.read(root).map(_.completedShards).getOrElse(Set.empty)
    val missing = (0 until shards).filterNot(done).toVector
    var manifest = IndexManifest.read(root).getOrElse(
      Manifest(0L, Analyzer.Version, fingerprint, nDocs, avgdl, Nil))
    // The FIRST wave of a fresh build can use the cheap static commit
    // (nothing to preserve); every later wave — and any resume — must use
    // dynamic partition overwrite so only the touched shard partitions
    // are rewritten and committed work (incl. stale partial dirs from a
    // killed run) is handled correctly.
    var firstFreshWave = done.isEmpty

    missing.grouped(math.max(1, waveSize)).foreach { wave =>
      spark.conf.set("spark.sql.sources.partitionOverwriteMode",
        if (firstFreshWave) "static" else "dynamic")
      firstFreshWave = false
      val waveSet = wave.toSet
      val acc = new ShardMetricsAcc
      spark.sparkContext.register(acc, "shardMetrics")
      val waveTf = tf.filter($"shard".isin(wave: _*))
        .repartition(math.min(wave.size, shards), $"shard")
        .sortWithinPartitions($"shard", $"term", $"docId")
      timed(s"postings-wave") {
        val encoded = waveTf.mapPartitions { rows =>
          encodePartition(rows, maxChunkPostings).map { pl =>
            acc.add((pl.shard, if (pl.chunk == 0) 1L else 0L, pl.count,
              pl.docIds.length.toLong + pl.tfs.length + pl.dls.length))
            pl
          }
        }
        encoded.write.mode(SaveMode.Overwrite)
          .partitionBy("shard").parquet(P.postings)
      }

      // per-shard metrics (terms, postings, bytes) + lineage for manifest,
      // collected by the encode tasks (accumulator — no re-read job).
      // Caveat: accumulator updates from retried tasks can double-count;
      // acceptable for metrics (Spark's own convention for task metrics),
      // and impossible in the deterministic local runs the gate uses.
      val metrics = acc.value.toSeq.map { case (s, (t, p, b)) =>
        ShardEntry(s, t, p, b, Seq(s))
      }
      val covered = metrics.map(_.shard).toSet
      // shards with zero postings still count as completed
      val empty = waveSet.diff(covered).map(s => ShardEntry(s, 0L, 0L, 0L, Seq(s)))
      manifest = manifest.copy(
        snapshotId = manifest.snapshotId + 1,
        shards = manifest.shards ++ metrics ++ empty)
      IndexManifest.commit(root, manifest)
    }

    BuiltIndex(root, manifest)
  }

  /** Streaming posting-list encoder: consumes rows sorted by
    * (shard, term, docId), emits one PostingList per (shard, term, chunk)
    * without ever materializing an unsorted buffer (SURVEY.md §2.4 A3 —
    * preferred over a collect_list Aggregator because input arrives
    * pre-sorted and hot lists never sit in an agg hash map). */
  def encodePartition(rows: Iterator[org.apache.spark.sql.Row],
                      maxChunk: Int): Iterator[PostingList] = {
    new Iterator[PostingList] {
      private var curShard = -1
      private var curTerm: String = null
      private var chunk = 0
      private val docBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
      private val tfBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
      private val dlBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
      private var pending: PostingList = null
      private var done = false

      private def flush(): PostingList = {
        val ds = docBuf.toArray
        val ts = tfBuf.toArray
        val dls = dlBuf.toArray
        val out = PostingList(curShard, curTerm, chunk, ds.length.toLong,
          if (ts.isEmpty) 0 else ts.max,
          PostingCodec.encodeDocIds(ds), PostingCodec.encodeTfs(ts),
          PostingCodec.encodeTfs(dls),
          PostingCodec.blockMaxTf(ts), blockMin(dls))
        docBuf.clear(); tfBuf.clear(); dlBuf.clear()
        out
      }

      private def blockMin(dls: Array[Int]): Array[Int] = {
        if (dls.isEmpty) return Array.empty
        val bs = PostingCodec.BlockSize
        val nb = (dls.length + bs - 1) / bs
        Array.tabulate(nb) { b =>
          var m = Int.MaxValue
          var i = b * bs
          val end = math.min(i + bs, dls.length)
          while (i < end) { if (dls(i) < m) m = dls(i); i += 1 }
          m
        }
      }

      private def step(): Unit = {
        while (pending == null && !done) {
          if (!rows.hasNext) {
            done = true
            if (docBuf.nonEmpty) pending = flush()
          } else {
            val r = rows.next()
            // row: docId, term, tf, dl, shard (column order from stage 2)
            val docId = r.getAs[Long]("docId")
            val term = r.getAs[String]("term")
            val t = r.getAs[Int]("tf")
            val dl = r.getAs[Int]("dl")
            val shard = r.getAs[Int]("shard")
            if (curTerm == null) { curShard = shard; curTerm = term; chunk = 0 }
            else if (shard != curShard || term != curTerm) {
              pending = flush()
              curShard = shard; curTerm = term; chunk = 0
            } else if (docBuf.length >= maxChunk) {
              pending = flush()
              chunk += 1
            }
            docBuf += docId; tfBuf += t; dlBuf += dl
          }
        }
      }

      override def hasNext: Boolean = { step(); pending != null }
      override def next(): PostingList = {
        step()
        val out = pending; pending = null; out
      }
    }
  }

  /** Typed readers over a built index. */
  def loadTermStats(spark: SparkSession, root: String): Dataset[TermStats] = {
    import spark.implicits._
    spark.read.parquet(Paths(root).termStats).as[TermStats]
  }
  def loadDocs(spark: SparkSession, root: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(Paths(root).docs).as[Doc]
  }
  def loadPostings(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(Paths(root).postings)
  def loadTf(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(Paths(root).tf)
}
