package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import java.sql.Timestamp

/** Structured Streaming twins of the batch pipeline (SURVEY.md §2g).
  * The reference is cron-batch — its incremental-window + idempotent
  * upsert pattern (load_sales_data.py:146-147, kicc_to_tb_sales_prod
  * .py:142-147) is what watermark + dropDuplicates + windowed
  * aggregation replace in a streaming deployment. Kept out of the
  * graded oracle set (not DuckDB-expressible); exercised by
  * StreamingSpec via MemoryStream.
  *
  * Every transform here is a plain DataFrame => DataFrame that works
  * identically on a batch or a streaming frame — the declarative plan
  * is the portability boundary, exactly as Spark intends.
  */
object StreamingOps {

  /** Exactly-once-per-event semantics over an at-least-once source:
    * watermark bounds the dedup state (events later than `delay`
    * behind the max seen ts are dropped), and redelivery is collapsed
    * BY EVENT ID ALONE — `dropDuplicatesWithinWatermark`, not plain
    * `dropDuplicates(id, ts)`: the plain form needs the event-time
    * column in the key to evict state, which silently weakens the
    * contract to per-(id, ts) — a producer retry that re-stamps the
    * send time then flows through twice and double-counts downstream
    * (r14 review). State is one id per event inside the watermark
    * horizon. The streaming analog of the reference's idempotent PK
    * upsert (load_sales_data.py:129-134).
    *
    * NULL ids bypass the dedup (r16 review pass 10, the dedupByContent
    * rationale): dropDuplicates treats NULL as a key value, so every
    * id-less event in the horizon would collapse into ONE survivor —
    * but an event without identity cannot be proven a redelivery of
    * anything. They ride the union branch untouched, paying no state.
    */
  def dedupEvents(events: DataFrame, idCol: String, tsCol: String,
                  delay: String): DataFrame = {
    val wm = events.withWatermark(tsCol, delay)
    wm.filter(col(idCol).isNotNull)
      .dropDuplicatesWithinWatermark(idCol)
      .unionByName(wm.filter(col(idCol).isNull))
  }

  // the one watermark → window×key → agg → flatten chain both
  // windowed twins share (r14 review: it was written twice)
  private def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
                          windowLen: String, delay: String,
                          agg: Column, outName: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(agg.as(outName))
      .select(col("window.start").as("window_start"), col(keyCol),
        col(outName))

  /** Tumbling event-time window counts — the streaming twin of
    * q27_sessionize. State is bounded by the watermark; at 100 TB/day
    * the window+key grouping is the only shuffle.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, delay: String): DataFrame =
    windowedAgg(events, tsCol, keyCol, windowLen, delay,
      count(lit(1)), "n")

  /** Incremental per-key running sum of a value column — streaming
    * analog of q22_running_total; emits one row per (key, window)
    * when the watermark closes it. finiteOrNull carries the batch
    * twin's money contract (r16 naninf probe): q22 sums through a
    * DECIMAL cast that nulls NaN/±Inf, so one poisoned measure skips
    * instead of turning a window's total — and every later cumulative
    * emit of that group — into NaN forever.
    */
  def windowedSums(events: DataFrame, tsCol: String, keyCol: String,
                   valCol: String, windowLen: String, delay: String): DataFrame =
    windowedAgg(events, tsCol, keyCol, windowLen, delay,
      sum(graft.ops.RelationalOps.finiteOrNull(col(valCol))), "total")

  /** Streaming exact-content dedup for a document stream — the
    * streaming twin of [[graft.ops.TextOps.exactDedupGroups]] (q24):
    * a doc whose sha256(text) already arrived within the watermark
    * horizon is dropped. `dropDuplicatesWithinWatermark`, NOT plain
    * dropDuplicates: the plain form only evicts state when the
    * EVENT-TIME column is part of the dedup key — keyed on the hash
    * alone it would retain every distinct hash ever seen, forever
    * (the exact unbounded-state failure the WithinWatermark variant
    * was added for in Spark 3.5). State is one 256-bit hash per
    * distinct doc inside the horizon — bounded by the watermark,
    * never by corpus size — which is what makes continuous corpus
    * ingest feasible at 100 TB/day (the batch op dedups a snapshot;
    * this dedups forever). The working hash column does not leak into
    * the output schema.
    *
    * NULL text bypasses the dedup entirely (r13): sha2(NULL) is NULL,
    * and a null dedup key would collapse EVERY null-text doc in the
    * horizon into one survivor — absent content is not shared
    * content. The batch twin excludes null-text docs from groups for
    * the same reason (exactDedupGroups, r12); here they ride the
    * union branch untouched, paying no dedup state.
    */
  def dedupByContent(docs: DataFrame, textCol: String, tsCol: String,
                     delay: String): DataFrame = {
    val wm = docs.withWatermark(tsCol, delay)
    wm.filter(col(textCol).isNotNull)
      .withColumn("_content_hash", sha2(col(textCol), 256))
      .dropDuplicatesWithinWatermark("_content_hash")
      .drop("_content_hash")
      .unionByName(wm.filter(col(textCol).isNull))
  }

  /** Streaming keyed upsert — the reference's re-runnable nightly
    * MERGE (load_sales_data.py:129-134) as a continuous pipeline: each
    * micro-batch flows through the DSv2 keyed-upsert sink's two-phase
    * commit via `foreachBatch` (Spark's idiomatic bridge from a stream
    * to any batch writer). At-least-once delivery composed with a
    * keyed idempotent merge yields effectively-once table state — a
    * redelivered micro-batch re-merges to identical rows. The same
    * line pointed at [[graft.sources.JdbcUpsert]] upserts into a real
    * database instead.
    *
    * `checkpointDir` is REQUIRED (r14 review): without an explicit
    * checkpoint Spark allocates a throwaway temp dir, so a restarted
    * query cannot resume its source offsets — a replayable source
    * restarts from its defaults and either loses the outage's events
    * or re-merges the whole topic. The at-least-once + idempotent-
    * merge composition this doc promises only holds across restarts
    * when the offsets survive them (maintainMart below always had
    * this; the two ops now share the discipline).
    */
  def upsertEachBatch(df: DataFrame, table: String, keys: Seq[String],
                      checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.format("graft.sources.UpsertSinkSource")
          .option("table", table).option("keys", keys.mkString(","))
          .mode("append").save()
      }
      .start()

  /** Continuous mart maintenance: a STATEFUL streaming aggregation in
    * update mode, each micro-batch's updated groups merged into the
    * keyed-upsert serving table, drained to completion with
    * Trigger.AvailableNow. Update mode emits a group's CUMULATIVE
    * aggregate every time a batch touches it; composed with a
    * latest-wins keyed merge, the serving table always converges to
    * the full-history aggregate — even when one key's rows straddle
    * micro-batches — without ever rescanning history (the O(delta)
    * nightly property q82 proves for the batch path). The checkpoint
    * makes restarts resume from the last committed batch; a
    * re-delivered batch re-merges to identical rows (idempotent).
    * A production deployment with late data adds a watermark upstream
    * to bound the aggregation state; on a bounded backfill like this
    * the state is the group count itself.
    */
  def maintainMart(aggregated: DataFrame, table: String, keys: Seq[String],
                   checkpointDir: String,
                   afterBatchCommit: Long => Unit = _ => ()): StreamingQuery =
    aggregated.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.format("graft.sources.UpsertSinkSource")
          .option("table", table).option("keys", keys.mkString(","))
          .mode("append").save()
        // test seam: runs AFTER the sink's manifest install but BEFORE
        // foreachBatch returns (i.e. before the checkpoint marks the
        // batch committed) — throwing here simulates a crash in the
        // torn window the idempotent keyed merge must absorb on restart
        afterBatchCommit(batchId)
      }
      .start()

  /** Watermarked stream–stream interval join — the streaming twin of
    * the batch as-of attribution (q57 / TemporalOps.asofJoin): each
    * purchase joins every click by the same user within the trailing
    * `horizon` (purchase-side rows with no qualifying click are
    * emitted with nulls once the watermark passes — left-outer
    * semantics). Spark keeps BOTH sides' state bounded by the
    * watermark + the time-interval condition; without the interval
    * bound a stream–stream join would buffer forever, the classic
    * unbounded-state failure at 100 TB/day. Downstream, a keyed
    * max_by picks the latest click per purchase when exactly-one
    * attribution is needed.
    */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      keyCol: String, pTsCol: String, cTsCol: String,
                      horizon: String, delay: String): DataFrame = {
    require(pTsCol != cTsCol,
      "the two sides' timestamp columns must be named distinctly " +
        "(they both survive into the joined output)")
    val p = purchases.withWatermark(pTsCol, delay)
    val c = clicks.withWatermark(cTsCol, delay)
    p.join(c,
      p(keyCol) === c(keyCol) &&
        col(cTsCol) >= col(pTsCol) - expr(s"INTERVAL $horizon") &&
        col(cTsCol) <= col(pTsCol),
      "leftOuter")
      .drop(c(keyCol))
  }

  /** Stream–static broadcast enrichment — the streaming twin of the
    * batch dim joins (J1/J2): every micro-batch joins against the
    * static dimension with a broadcast hash join, so the unbounded
    * fact stream is never shuffled and carries no join state at all
    * (unlike stream–stream joins, a static side needs no watermark).
    * Left-outer keeps facts whose key has no dim row — the enrich-
    * don't-drop contract of the nightly jobs.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")

  /** Typed event for gap-timeout sessionization. */
  final case class UserEvent(user_id: Long, ts: Timestamp)

  /** Per-user open-session state (epoch millis bounds). */
  final case class SessionState(start: Long, end: Long, n: Long)

  /** A closed session, emitted when the gap timeout fires. */
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
                                 session_end: Timestamp, n_events: Long)

  /** CUSTOM STATE: gap-based sessionization via
    * `flatMapGroupsWithState` — the operator tumbling windows cannot
    * express (a session ends `gap` after the LAST event, not on a
    * fixed boundary). State is one (start, end, n) triple per live
    * user; the event-time timeout (watermark-driven) both closes
    * sessions and bounds state size — the 100-TB-stream requirement.
    * The timeout alone CANNOT carry the gap semantics: event-time
    * timeouts fire only for keys with no data in a batch, against the
    * watermark the PREVIOUS batch set — so a low-traffic key's first
    * post-gap event can arrive before its timeout ever fires, and one
    * micro-batch can pack events from both sides of a quiet period.
    * The data branch therefore splits on FORWARD gaps itself: events
    * are processed in ts order seeded with the open state, every
    * `> gap` jump closes the running session and opens a new one
    * (r14 review — the earlier `times.min` guard was defeated by a
    * single in-gap straggler sharing a batch with a post-gap event,
    * fusing two sessions across an arbitrarily long quiet period).
    * Out-of-order events AT OR BEFORE the running session's window
    * extend it backwards rather than re-deriving closed history —
    * in-watermark disorder is bounded by `delay`, so the error is at
    * most a session start stretched by the allowed lateness.
    */
  def sessionizeWithState(events: Dataset[UserEvent], gapMs: Long,
                          delay: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    // an event without an event time cannot be placed in any session
    // — and `_.ts.getTime` on it would NPE the whole task (r16 review
    // pass 10). Dropped explicitly, the same quarantine posture as
    // every other absent-measure contract; the filter is visible in
    // the plan instead of relying on the watermark operator's
    // null-row behavior.
    events.filter((e: UserEvent) => e.ts != null)
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evts: Iterator[UserEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user,
              new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val times = evts.map(_.ts.getTime).toVector.sorted
            val closed = Vector.newBuilder[ClosedSession]
            var cur = state.getOption.orNull
            times.foreach { t =>
              if (cur == null) cur = SessionState(t, t, 1L)
              else if (t > cur.end + gapMs) {
                // the gap elapsed in EVENT time: close the running
                // session (the timeout would never fire — this key HAS
                // data in the batch) and open a fresh one
                closed += ClosedSession(user,
                  new Timestamp(cur.start), new Timestamp(cur.end), cur.n)
                cur = SessionState(t, t, 1L)
              } else cur = SessionState(math.min(cur.start, t),
                math.max(cur.end, t), cur.n + 1L)
            }
            if (cur != null) { // defensive: no state AND no events
              state.update(cur)
              state.setTimeoutTimestamp(cur.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
