package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * behind the max seen ts are dropped), dropDuplicates collapses
    * redelivery by event id. The streaming analog of the reference's
    * idempotent PK upsert (load_sales_data.py:129-134).
    */
  def dedupEvents(events: DataFrame, idCol: String, tsCol: String,
                  delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicates(idCol, tsCol)

  /** Tumbling event-time window counts — the streaming twin of
    * q27_sessionize. State is bounded by the watermark; at 100 TB/day
    * the window+key grouping is the only shuffle.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** Incremental per-key running sum of a value column — streaming
    * analog of q22_running_total; emits one row per (key, window)
    * when the watermark closes it.
    */
  def windowedSums(events: DataFrame, tsCol: String, keyCol: String,
                   valCol: String, windowLen: String, delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(sum(col(valCol)).as("total"))
      .select(col("window.start").as("window_start"), col(keyCol), col("total"))
}
