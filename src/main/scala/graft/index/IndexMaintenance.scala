package graft.index

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.model.Turn
import graft.query.SearchEngine

/** Incremental index maintenance — the Spark re-expression of the
  * reference's `POST /api/indexPage` path (SURVEY.md §3.3; reference:
  * IndexingServiceImpl.java:126-138 → PrepareDatabaseBeforeIndexingAction
  * .java:39-59 delete + LemmaServiceImpl.java:81-92 df decrement): a
  * partition-scoped rewrite of ONLY the shards holding the touched
  * documents, followed by a set-based term-stats recomputation and an
  * atomic manifest snapshot — never row-at-a-time mutation (S6 mapping,
  * SURVEY.md §2.1).
  *
  * docId semantics under maintenance mirror the reference's auto-increment
  * ids (PageEntity.java:18-21):
  *  - REPLACE of an existing (conv_id, turn_idx) keeps its docId — ranks
  *    are key-ordered and keys are unchanged;
  *  - DELETE leaves a gap in the docId space (exactly like deleted MySQL
  *    rows; dense-rank contiguity is a FRESH-BUILD invariant, maintenance
  *    preserves *stability* instead — queries never depend on contiguity);
  *  - APPEND assigns fresh docIds after the current maximum into NEW
  *    shards (supported for conv_ids sorting after all existing ones,
  *    which is the natural shape for transcript streams keyed by
  *    time-ordered ids).
  */
object IndexMaintenance {

  /** Shards containing rows matching `cond` — read straight off the
    * `shard` partition column (a distinct over at most #shards values);
    * no docIds, filenames, or rows ever reach the driver. */
  private def affectedShards(spark: SparkSession, root: String,
                             cond: org.apache.spark.sql.Column): Seq[Int] = {
    import spark.implicits._
    spark.read.parquet(IndexBuilder.Paths(root).docs)
      .filter(cond)
      .select($"shard").distinct()
      .as[Int].collect().toSeq.sorted
  }

  /** Delete whole conversations: rewrites only the shards containing
    * them, recomputes term stats set-based, commits a new snapshot.
    * Returns affected shard ids.
    *
    * Driver traffic is O(#affected shards): targeting uses the `shard`
    * partition column and the delete itself is a broadcast anti-join on
    * conv_id — deleting a huge tenant moves no docIds through the driver
    * (the r01 `collect + isin` version OOMed by design there). */
  def deleteConversations(spark: SparkSession, root: String,
                          convIds: Set[String]): Seq[Int] = {
    import spark.implicits._
    deleteConversationsDf(spark, root,
      convIds.toSeq.toDF("conv_id"))
  }

  /** Scale variant: the conv_ids to delete arrive as a DataFrame (e.g. a
    * tombstone table) and are anti-joined — nothing is collected. */
  def deleteConversationsDf(spark: SparkSession, root: String,
                            convs: org.apache.spark.sql.DataFrame): Seq[Int] = {
    import spark.implicits._
    // drop pinned caches FIRST: the rewrite itself re-reads term_stats /
    // postings, and Spark's plan-matching cache would otherwise serve the
    // pre-maintenance version INTO the new manifest (stale avgdl)
    SearchEngine.disableServingCache(root)
    val drop = broadcast(convs.select(col("conv_id")).distinct())
    val P = IndexBuilder.Paths(root)
    val affected = spark.read.parquet(P.docs)
      .join(drop, Seq("conv_id"), "left_semi")
      .select($"shard").distinct().as[Int].collect().toSeq.sorted
    if (affected.isEmpty) return Nil
    rewriteShards(spark, root, affected, dropConvs = Some(drop))
    affected
  }

  /** Replace the text of existing turns (same (conv_id, turn_idx) keys ⇒
    * same docIds). Unknown keys are rejected — replacement must not
    * reorder ranks. Returns affected shard ids. */
  def replaceTurns(spark: SparkSession, root: String,
                   turns: Seq[Turn]): Seq[Int] = {
    import spark.implicits._
    require(turns.nonEmpty, "nothing to replace")
    replaceTurnsDs(spark, root, spark.createDataset(turns))
  }

  /** Scale variant: replacements arrive as a Dataset and are applied with
    * a join against the affected shards' docs (Catalyst broadcasts a
    * small batch by itself; a bulk re-ingest stays fully distributed —
    * nothing is collected or broadcast by hand). */
  def replaceTurnsDs(spark: SparkSession, root: String,
                     turns: org.apache.spark.sql.Dataset[Turn]): Seq[Int] = {
    import spark.implicits._
    // several jobs read the batch (key check, shard targeting, rewrite):
    // pin ONE evaluation so a value-nondeterministic input cannot pass
    // the key check with one row set and rewrite with another (same
    // contract as appendConversationsDs / DocIdAssigner.assignCore)
    val batch = turns.localCheckpoint(true)
    try { // finally-unpersist covers the require rejections too
    val keys = batch.select($"conv_id", $"turn_idx").distinct()
    // unknown keys are rejected distributively (≤5 examples to the driver)
    val missing = keys
      .join(IndexBuilder.loadDocs(spark, root).select($"conv_id", $"turn_idx"),
        Seq("conv_id", "turn_idx"), "left_anti")
      .take(5)
      .map(r => (r.getString(0), r.getInt(1)))
    require(missing.isEmpty,
      s"replaceTurns requires existing keys; missing: ${missing.toSeq} " +
      "(additions go through appendConversations / a fresh build)")
    SearchEngine.disableServingCache(root) // before rewrites: see deleteConversationsDf
    val shards = IndexBuilder.loadDocs(spark, root)
      .join(keys, Seq("conv_id", "turn_idx"), "left_semi")
      .select($"shard").distinct().as[Int].collect().toSeq.sorted
    rewriteShards(spark, root, shards, replace = Some(batch.toDF()))
    shards
    } finally batch.unpersist() // free the checkpoint blocks (long-running
                                // callers would otherwise accumulate them,
                                // incl. rejected batches)
  }

  /** Core partition-scoped rewrite: re-derive docs → tf → postings for the
    * affected shards from (old docs ∖ deleted) ∪ replacements, then
    * recompute term_stats from the full tf table (exact df — the
    * set-based analog of the reference's decrement, never ±1 mutation)
    * and commit a new manifest snapshot. */
  private def rewriteShards(spark: SparkSession, root: String,
                            shards: Seq[Int],
                            dropConvs: Option[org.apache.spark.sql.DataFrame] = None,
                            replace: Option[org.apache.spark.sql.DataFrame] = None): Unit = {
    import spark.implicits._
    if (shards.isEmpty) return
    val P = IndexBuilder.Paths(root)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    // new docs content for the affected shards; deletions are an
    // anti-join (distributed), never an isin over collected ids
    val oldDocs = spark.read.parquet(P.docs).filter($"shard".isin(shards: _*))
    val kept = dropConvs match {
      case Some(drop) => oldDocs.join(drop, Seq("conv_id"), "left_anti")
      case None => oldDocs
    }
    val newDocs = replace match {
      case None => kept
      case Some(repl) =>
        // left join against the replacement batch: a small batch
        // broadcasts (Catalyst's call), a bulk one sort-merges — either
        // way nothing is collected. dl = RAW token count of the new text
        // (the same unstemmed length the build computes; stemming only
        // affects terms).
        // one replacement per key: duplicate keys in the batch would
        // duplicate doc rows through the join (dedupe upstream if the
        // surviving copy matters)
        val r = repl.dropDuplicates("conv_id", "turn_idx")
          .select($"conv_id", $"turn_idx",
            $"role".as("r_role"), $"text".as("r_text"), $"tool".as("r_tool"))
        kept.join(r, Seq("conv_id", "turn_idx"), "left")
          .select($"docId", $"conv_id", $"turn_idx",
            coalesce($"r_role", $"role").as("role"),
            coalesce($"r_text", $"text").as("text"),
            coalesce($"r_tool", $"tool").as("tool"),
            when($"r_text".isNotNull,
              size(graft.functions.TokensExpression.tokens($"r_text")))
              .otherwise($"dl").cast("int").as("dl"),
            $"shard")
    }
    // Spark refuses to overwrite a path it is reading (correctly), and a
    // fully-deleted shard would leave a stale dir behind a dynamic
    // overwrite — so: write the affected shards to a temp table, then
    // swap whole shard dirs (delete old, move new if any). The
    // repartition re-establishes the ONE-FILE-PER-SHARD layout invariant
    // the aligned query scan and the chunk-ordinal metric depend on: a
    // big shard file would otherwise split across scan tasks here and
    // each task would write its own fragment file into the shard dir.
    val tmpDocs = P.docs + ".rewrite"
    newDocs
      .select($"docId", $"conv_id", $"turn_idx", $"role", $"text", $"tool",
        $"dl", $"shard")
      .repartition($"shard")
      .sortWithinPartitions($"shard", $"docId")
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(tmpDocs)
    swapShardDirs(spark, P.docs, tmpDocs, shards)

    // postings for affected shards — straight from docs, as the build
    // (in-task term counts; analyzer variant from the manifest). The
    // one-file-per-task guard matters here exactly as in the build: a
    // docs file split across scan tasks would restart chunk ordinals per
    // task, inflating the manifest `terms` metric (chunk==0 counted per
    // task) and producing multi-file shard dirs that knock the query
    // path off its shuffle-free aligned scan.
    val stem = IndexManifest.read(root).exists(_.analyzerVersion == Analyzer.StemVersion)
    val acc = new IndexBuilder.ShardMetricsAcc
    spark.sparkContext.register(acc, "maintShardMetrics")
    IndexBuilder.withOneFilePerTask(spark, P.docs) { docsAll =>
      docsAll.filter($"shard".isin(shards: _*))
        .select($"docId", $"dl", $"shard", $"text")
        .mapPartitions { rows =>
          IndexBuilder.invertDocsPartition(rows, stem,
            IndexBuilder.MaxChunkPostings,
            IndexBuilder.MaxBufferedPostings).map { pl =>
            acc.add((pl.shard, if (pl.chunk == 0) 1L else 0L, pl.count,
              pl.docIds.length.toLong + pl.tfs.length + pl.dls.length,
              pl.sumTf))
            pl
          }
        }
        .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(P.postings)
    }
    // a shard whose docs were all deleted has no rows left: drop its files
    val written = acc.value.keySet
    shards.filterNot(written).foreach { s0 =>
      deleteDir(spark, s"${P.postings}/shard=$s0")
    }

    // term stats: exact re-aggregation over the postings pre-aggregates,
    // atomically swapped (set-based df decrement) — AFTER the postings
    // rewrite it derives from
    refreshTermStats(spark, root)

    // refreshed corpus stats + manifest snapshot
    commitRefreshedManifest(spark, root, replacedShards = shards,
      newEntries = acc.value.toSeq.map { case (s0, (t, p, b, d)) =>
        ShardEntry(s0, t, p, b, Seq(s0), sumDl = d) } ++
        shards.filterNot(written).map(s0 => ShardEntry(s0, 0L, 0L, 0L, Seq(s0))))
    // invalidate AGAIN after the commit: a query that started DURING the
    // rewrite (after the pre-rewrite flush bumped the generation) would
    // otherwise memoize a half-swapped-index result under the current
    // generation and serve it until the next maintenance
    SearchEngine.disableServingCache(root)
  }

  /** Append whole new conversations (reference: indexPage on a NEW page,
    * IndexingThreadAction.java:126-141) — any new (conv_id, turn_idx)
    * keys, in or out of conv-id order (the reference's indexPage accepts
    * any new page; backfills are the common case). New docs get fresh
    * docIds after the current maximum, in (conv_id, turn_idx) order
    * within the batch, into NEW shards; nothing existing is rewritten
    * except the (tiny) dictionary and the manifest. docId semantics:
    * STABILITY, not global rank order — an out-of-order conversation's
    * docIds are simply a later contiguous segment, which scoped queries
    * handle exactly (SearchEngine.scopeSegments). Keys that already
    * exist are rejected — updates go through replaceTurns. */
  def appendConversations(spark: SparkSession, root: String,
                          turns: Seq[Turn], newShards: Int = 1): Seq[Int] = {
    import spark.implicits._
    require(turns.nonEmpty, "nothing to append")
    appendConversationsDs(spark, root, spark.createDataset(turns), newShards)
  }

  /** Scale variant (VERDICT r02 item 5): the batch arrives as a
    * `Dataset[Turn]` and never materializes on the driver — a 100k-turn
    * backfill plans exactly like a 3-turn micro-batch. docId assignment
    * reuses [[DocIdAssigner.assignCore]] (the pid-column range-bucket
    * pass) offset past the current maximum, so the in-batch order is the
    * same dense (conv_id, turn_idx) rank a fresh build would give and the
    * docId-integrity logic exists in exactly one place. */
  def appendConversationsDs(spark: SparkSession, root: String,
                            turns: org.apache.spark.sql.Dataset[Turn],
                            newShards: Int = 1): Seq[Int] = {
    import spark.implicits._
    SearchEngine.disableServingCache(root) // before rewrites: see deleteConversationsDf
    val P = IndexBuilder.Paths(root)
    // assignCore runs SEVERAL jobs over the batch (count, boundary
    // sample, per-pid counts, the assignment write): pin ONE evaluation
    // with an eager localCheckpoint so a value-nondeterministic input
    // (e.g. the dropDuplicates survivor of a dedupIngest batch twin)
    // cannot yield different rows to different jobs — that would collide
    // docId offsets silently. Micro-batch / backfill sized, so the
    // distributed materialization is cheap; the fresh-build path reads a
    // storage table and needs no pin.
    val batch = turns.localCheckpoint(true)
    try {
    // max docId and shard come from the manifest (kept fresh by every
    // build/maintenance commit) — no full docs scan per micro-batch. A
    // GENUINELY EMPTY shard (postings == 0, e.g. quantile collapse at
    // build or a full-shard delete) legitimately carries (-1,-1) and
    // contributes nothing to the max; only an UNSTAMPED non-empty entry
    // (legacy manifest) forces the docs-scan fallback — never risk a
    // docId collision.
    val m0 = IndexManifest.read(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    val stamped = m0.shards.filter(_.maxDocId >= 0)
    val maxDocId =
      if (stamped.nonEmpty &&
          m0.shards.forall(e => e.maxDocId >= 0 || e.postings == 0))
        stamped.map(_.maxDocId).max
      else IndexBuilder.loadDocs(spark, root).agg(max($"docId")).head().getLong(0)
    val maxShard = m0.shards.map(_.shard).max
    // existing keys are rejected distributively (semi join — only the ≤5
    // offending examples ever reach the driver; Catalyst broadcasts the
    // smaller side itself, so a giant backfill doesn't force a broadcast)
    val dup = IndexBuilder.loadDocs(spark, root)
      .select($"conv_id", $"turn_idx")
      .join(batch.select($"conv_id", $"turn_idx").distinct(),
        Seq("conv_id", "turn_idx"), "left_semi")
      .take(5)
      .map(r => (r.getString(0), r.getInt(1)))
    require(dup.isEmpty,
      s"appendConversations requires NEW keys; existing: ${dup.toSeq} " +
      "(updates go through replaceTurns)")

    // docIds continue the dense rank after maxDocId, spread over
    // newShards fresh contiguous-range shards
    val (newDocs, stats) = DocIdAssigner.assignCore(spark, batch,
      buckets = newShards, baseDocId = maxDocId + 1, baseShard = maxShard + 1)
    require(stats.nDocs > 0, "nothing to append")
    val shards = stats.ranges.keys.toSeq.sorted

    newDocs
      .select($"docId", $"conv_id", $"turn_idx", $"role", $"text", $"tool",
        $"dl", $"shard")
      .sortWithinPartitions($"shard", $"docId")
      .write.mode(SaveMode.Append).partitionBy("shard").parquet(P.docs)

    // postings for the new shards only — straight from docs, one file
    // per task (shard↔task alignment, as the build)
    val stem = IndexManifest.read(root).exists(_.analyzerVersion == Analyzer.StemVersion)
    val acc = new IndexBuilder.ShardMetricsAcc
    spark.sparkContext.register(acc, "appendShardMetrics")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    IndexBuilder.withOneFilePerTask(spark, P.docs) { docsAll =>
      docsAll.filter($"shard".isin(shards: _*))
        .select($"docId", $"dl", $"shard", $"text")
        .mapPartitions { rs =>
          IndexBuilder.invertDocsPartition(rs, stem,
            IndexBuilder.MaxChunkPostings,
            IndexBuilder.MaxBufferedPostings).map { pl =>
            acc.add((pl.shard, if (pl.chunk == 0) 1L else 0L, pl.count,
              pl.docIds.length.toLong + pl.tfs.length + pl.dls.length,
              pl.sumTf))
            pl
          }
        }
        .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(P.postings)
    }

    // dictionary: exact re-aggregation over postings (after the write)
    refreshTermStats(spark, root)

    // EVERY appended shard needs a manifest entry, including one whose
    // docs produced zero postings (e.g. a micro-batch of zero-token
    // turns): without it the next append would reuse the shard id AND
    // re-assign its docIds — the entry's docId range is stamped from the
    // docs scan in commitRefreshedManifest, which is what keeps the
    // manifest-sourced maxDocId fast path correct.
    val accEntries = acc.value.toSeq.map { case (s0, (t, p, b, d)) =>
      ShardEntry(s0, t, p, b, Seq(s0), sumDl = d) }
    val postingless = shards.filterNot(accEntries.map(_.shard).toSet)
      .map(s0 => ShardEntry(s0, 0L, 0L, 0L, Seq(s0)))
    commitRefreshedManifest(spark, root, replacedShards = Nil,
      newEntries = accEntries ++ postingless)
    // invalidate AGAIN after the commit: a query that started DURING the
    // append could otherwise memoize a mid-append result under the
    // generation bumped by the entry invalidation above
    SearchEngine.disableServingCache(root)
    shards
    } finally batch.unpersist() // streaming ingest appends per micro-batch
                                // — checkpoint blocks must not accumulate
                                // (incl. rejected/failed batches)
  }

  private def refreshTermStats(spark: SparkSession, root: String): Unit = {
    import spark.implicits._
    val P = IndexBuilder.Paths(root)
    // df/maxTf/sumTf over per-chunk pre-aggregates (≤ shards × chunks
    // rows per term — hot-term skew structurally bounded, no salting
    // needed on pre-combined rows)
    spark.read.parquet(P.postings)
      .groupBy($"term")
      .agg(sum($"count").as("df"), max($"maxTf").as("maxTf"),
        sum($"sumTf").as("sumTf"))
      .select($"term", $"df", $"maxTf".cast("int").as("maxTf"), $"sumTf")
      .write.mode(SaveMode.Overwrite).parquet(P.termStats + ".tmp")
    // Hadoop FileSystem API throughout (HDFS/S3/local alike — the build
    // path already follows this; java.nio would throw off-box). rename is
    // atomic on HDFS/local; the .old backup keeps a recoverable copy
    // through the two-step swap.
    val fs = fileSystem(spark, P.termStats)
    val cur = new org.apache.hadoop.fs.Path(P.termStats)
    val tmp = new org.apache.hadoop.fs.Path(P.termStats + ".tmp")
    val bak = new org.apache.hadoop.fs.Path(P.termStats + ".old")
    if (fs.exists(bak)) fs.delete(bak, true)
    renameOrThrow(fs, cur, bak)
    renameOrThrow(fs, tmp, cur) // on failure: bak still holds the old copy
    fs.delete(bak, true)
    ()
  }

  private def commitRefreshedManifest(spark: SparkSession, root: String,
                                      replacedShards: Seq[Int],
                                      newEntries: Seq[ShardEntry]): Unit = {
    import spark.implicits._
    val P = IndexBuilder.Paths(root)
    val n = spark.read.parquet(P.docs).count()
    val tot = spark.read.parquet(P.termStats).agg(sum($"sumTf")).head().getLong(0)
    val hashUdf = udf((c: String, t: Int, x: String) =>
      DocIdAssigner.rowHash(c, t, x))
    val fp = spark.read.parquet(P.docs)
      .select(hashUdf($"conv_id", $"turn_idx", $"text").as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    val old = IndexManifest.read(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    // refreshed docId ranges for the touched shards (one tiny agg over
    // the affected partitions only)
    val touched = (replacedShards ++ newEntries.map(_.shard)).distinct
    val ranges =
      if (touched.isEmpty) Map.empty[Int, (Long, Long)]
      else spark.read.parquet(P.docs)
        .filter($"shard".isin(touched: _*))
        .groupBy($"shard").agg(min($"docId"), max($"docId"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stamped = newEntries.map { e =>
      val (lo, hi) = ranges.getOrElse(e.shard, (-1L, -1L))
      e.copy(minDocId = lo, maxDocId = hi)
    }
    IndexManifest.commit(root, old.copy(
      snapshotId = old.snapshotId + 1,
      inputFingerprint = s"$n-$fp",
      nDocs = n,
      avgdl = tot.toDouble / math.max(1L, n),
      shards = old.shards.filterNot(s =>
        replacedShards.contains(s.shard) ||
        stamped.exists(_.shard == s.shard)) ++ stamped))
  }

  private def fileSystem(spark: SparkSession,
                         path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Hadoop rename reports most failures by RETURNING FALSE (e.g. S3A
    * destination-exists, transient IO) — ignoring it can cascade into
    * deleting the only surviving copy. Fail loudly instead. */
  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                            from: org.apache.hadoop.fs.Path,
                            to: org.apache.hadoop.fs.Path): Unit =
    require(fs.rename(from, to), s"filesystem rename failed: $from -> $to")

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fileSystem(spark, dir)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Replace `target/shard=K` with `tmp/shard=K` for each affected shard
    * (absence in tmp ⇒ the shard is now empty ⇒ its dir is removed).
    * Hadoop FileSystem API — works on HDFS/S3/local alike. */
  private def swapShardDirs(spark: SparkSession, target: String, tmp: String,
                            shards: Seq[Int]): Unit = {
    val fs = fileSystem(spark, target)
    shards.foreach { k =>
      val dst = new org.apache.hadoop.fs.Path(s"$target/shard=$k")
      val src = new org.apache.hadoop.fs.Path(s"$tmp/shard=$k")
      if (fs.exists(dst)) fs.delete(dst, true)
      if (fs.exists(src)) renameOrThrow(fs, src, dst)
    }
    deleteDir(spark, tmp)
  }
}
