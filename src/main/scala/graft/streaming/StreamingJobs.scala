package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming jobs over the `events(event_id, ts, user_id,
  * event_type, value, props)` stream.
  *
  * The reference is batch-only (SURVEY.md §1.4 — its "incremental" path is
  * request-driven, §3.3); these jobs are the streaming extension a
  * transcript/event pipeline needs at scale: the SAME transformation
  * functions run on batch DataFrames (tested against batch results) and on
  * `readStream` inputs (watermark + windows + mapGroupsWithState), per the
  * unified Dataset API.
  */
object StreamingJobs {

  /** Tumbling hourly counts per event type; 10-minute watermark bounds
    * state for late data. Works on batch and streaming frames alike. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Sliding 30-minute windows every 10 minutes — rate monitoring shape. */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"), col("n"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Long, types: Seq[String])
  final case class SessionState(start: Long, last: Long, n: Long,
                                types: List[String])

  /** Session gap: 30 minutes of user inactivity closes a session. */
  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Stateful sessionization via flatMapGroupsWithState (event-time
    * timeout): emits a session when the gap elapses. The custom-state
    * construct of SURVEY.md's streaming mapping. */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.types.reverse))
          } else {
            val sorted = rows.toVector.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Vector.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= SessionGapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1,
                    e.event_type :: s.types))
                case Some(s) =>
                  out += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.types.reverse)
                  cur = Some(SessionState(t, t, 1L, List(e.event_type)))
                case None =>
                  cur = Some(SessionState(t, t, 1L, List(e.event_type)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + SessionGapMs)
            }
            out.result().iterator
          }
      }
  }

  /** Continuous index ingestion: a stream of transcript turns appended to
    * a built index per micro-batch via `foreachBatch` →
    * [[graft.index.IndexMaintenance.appendConversationsDs]] (Dataset-
    * native — the batch never materializes on the driver). Works for ANY
    * new keys (out-of-order conversations become later docId segments —
    * scoped queries stay exact) and the manifest commits a snapshot per
    * batch.
    *
    * Crash handling: the append is a copy-on-write snapshot commit
    * (IndexMaintenance scaladoc) — a crash BEFORE the manifest commit
    * leaves only orphan generation dirs no reader resolves, and the
    * replayed batch re-runs the append cleanly, overwriting them. An
    * existing-key rejection therefore means the batch was FULLY committed
    * before the crash (sink commit landed, checkpoint advance did not):
    * skip idempotently. [[assertFullyCommitted]] re-verifies that reading
    * (defense in depth: under the snapshot layout a mismatch is external
    * corruption, not a reachable crash state). Serving caches are
    * invalidated by the append itself. Returns the started query; callers
    * own awaitTermination/stop. */
  def indexIngest(turns: Dataset[graft.model.Turn], root: String,
                  checkpointDir: String,
                  newShardsPerBatch: Int = 1,
                  trigger: org.apache.spark.sql.streaming.Trigger =
                    org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    turns.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[graft.model.Turn], batchId: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          try {
            graft.index.IndexMaintenance.appendConversationsDs(
              spark, root, batch, newShards = newShardsPerBatch)
          } catch {
            case e: IllegalArgumentException
                if e.getMessage.contains("requires NEW keys") =>
              assertFullyCommitted(spark, root, batchId, e) // else: idempotent skip
          }
        }
        ()
      }
      .start()
  }

  /** Pre-index ingestion dedup: drop turns whose ANALYZED content
    * fingerprint (md5 over the normalized token stream — whitespace/case
    * variants collapse, the TextOps.fingerprint key) was already seen
    * within the watermark horizon. `dropDuplicatesWithinWatermark` bounds
    * the dedup state by event time — the plain streaming dropDuplicates
    * would grow state forever at ingest scale. Batch frames accept the
    * same transform (watermark is a no-op there), per the unified API. */
  def dedupIngest(turns: Dataset[graft.model.Turn],
                  watermark: String = "1 hour"): Dataset[graft.model.Turn] = {
    import turns.sparkSession.implicits._
    // ZERO-TOKEN (or null-text) turns all share md5("") — they are NOT
    // duplicates of each other and must pass through undeduped. Instead
    // of a second scan + union, such rows get a SURROGATE key from their
    // unique (conv_id, turn_idx) doc key, so one pass and one stateful
    // dedup handles both populations. coalesce: the tokenizer is
    // null-intolerant, and a null size would silently drop the row from
    // a bare size>0 predicate.
    val toks = graft.ops.TextOps.tokensCol
    val key = when(coalesce(size(toks), lit(0)) > 0,
        graft.ops.TextOps.fingerprintCol) // THE shared content key
      .otherwise(concat_ws("#", lit("__empty"), col("conv_id"),
        col("turn_idx").cast("string"))) // never collides with md5 hex
    val withFp = turns.withColumn("fp", key).withWatermark("ts", watermark)
    val deduped =
      if (turns.isStreaming) withFp.dropDuplicatesWithinWatermark("fp")
      else withFp.dropDuplicates("fp")
    deduped.drop("fp").as[graft.model.Turn]
  }

  /** Replay verification (see [[indexIngest]]): the committed manifest's
    * input fingerprint must match a re-fingerprint of the MANIFEST-
    * RESOLVED docs table. Under the copy-on-write snapshot layout a
    * crashed append's orphan rows live in an unreferenced generation dir
    * and never enter this read, so a mismatch can only mean external
    * corruption of committed files — fail loudly rather than skip a
    * batch against a corrupt index. */
  private def assertFullyCommitted(spark: SparkSession, root: String,
                                   batchId: Long, cause: Throwable): Unit = {
    val m = graft.index.IndexManifest.read(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root", cause))
    val hashUdf = udf((c: String, t: Int, x: String) =>
      graft.index.DocIdAssigner.rowHash(c, t, x))
    val agg = graft.index.IndexSnapshot.docs(spark, root, m)
      .select(hashUdf(col("conv_id"), col("turn_idx"), col("text")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).head()
    val fp = s"${agg.getLong(0)}-${agg.getLong(1)}"
    if (m.inputFingerprint != fp)
      throw new IllegalStateException(
        s"index corruption detected at $root while replaying batch " +
        s"$batchId: snapshot docs fingerprint $fp != committed manifest " +
        s"${m.inputFingerprint} — committed data files changed outside " +
        "the snapshot commit protocol. Rebuild or restore the index " +
        "before resuming ingest.", cause)
  }

  /** Batch oracle for sessionize (same gap rule, plain Scala) — used by
    * the spec to pin streaming semantics. */
  def sessionizeBatchOracle(events: Seq[Event]): Seq[Session] =
    events.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(_.ts.getTime)
      val sessions = Vector.newBuilder[Session]
      var cur: Option[SessionState] = None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= SessionGapMs =>
            cur = Some(SessionState(s.start, t, s.n + 1, e.event_type :: s.types))
          case Some(s) =>
            sessions += Session(uid, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.types.reverse)
            cur = Some(SessionState(t, t, 1L, List(e.event_type)))
          case None =>
            cur = Some(SessionState(t, t, 1L, List(e.event_type)))
        }
      }
      cur.foreach(s => sessions += Session(uid, new Timestamp(s.start),
        new Timestamp(s.last), s.n, s.types.reverse))
      sessions.result()
    }.sortBy(s => (s.user_id, s.start.getTime))
}
