package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming twins (SURVEY.md §2g) driven through
  * MemoryStream: the same StreamingOps transforms run on a streaming
  * frame, proving they are genuinely plan-portable (kept out of the
  * DuckDB oracle set — not SQL-expressible there).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts aggregates event-time tumbling windows over a stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val out = StreamingOps.windowedCounts(df, "ts", "event_type",
      "1 hour", "10 minutes")
    val q = out.writeStream.format("memory").queryName("wc_test")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:05:00"), "a"),
        (ts("2024-01-01 00:20:00"), "a"),
        (ts("2024-01-01 00:40:00"), "b"),
        (ts("2024-01-01 01:05:00"), "a"))
      q.processAllAvailable()
      val rows = spark.table("wc_test")
        .select(col("window_start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(rows === Set(
        ("2024-01-01 00:00:00", "a", 2L),
        ("2024-01-01 00:00:00", "b", 1L),
        ("2024-01-01 01:00:00", "a", 1L)))
    } finally q.stop()
  }

  test("dedupEvents collapses redelivered events across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val out = StreamingOps.dedupEvents(df, "event_id", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:00:01")), (2L, ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
      // redelivery of id 1 in a later micro-batch + one new event
      mem.addData((1L, ts("2024-01-01 00:00:01")), (3L, ts("2024-01-01 00:00:03")))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("windowedSums: per-key per-window totals on a stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "user", "value")
    val out = StreamingOps.windowedSums(df, "ts", "user", "value",
      "30 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("ws_test")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 09:00:00"), "u1", 1.5),
        (ts("2024-01-01 09:10:00"), "u1", 2.5),
        (ts("2024-01-01 09:40:00"), "u1", 10.0),
        (ts("2024-01-01 09:05:00"), "u2", 7.0))
      q.processAllAvailable()
      val rows = spark.table("ws_test")
        .select(col("window_start").cast("string"), col("user"), col("total"))
        .as[(String, String, Double)].collect().toSet
      assert(rows === Set(
        ("2024-01-01 09:00:00", "u1", 4.0),
        ("2024-01-01 09:30:00", "u1", 10.0),
        ("2024-01-01 09:00:00", "u2", 7.0)))
    } finally q.stop()
  }
}
