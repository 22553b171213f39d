package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Source-level pin for the events timestamp normalization: the
  * driver's fixture writer has shipped `events.ts` as nanosecond
  * longs, as TIMESTAMP (LTZ), and as TIMESTAMP_NTZ across rounds —
  * `Tables.events` must hand every consumer ONE type (session
  * TIMESTAMP) encoding the same instants for all three. q95's
  * behavior-level pin (TemporalOpsSpec) caught the NTZ break; this
  * pins the normalization itself, so a FOURTH flavor fails here with
  * a type diff instead of deep inside some consumer's epoch math.
  */
class TablesSpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
  }

  test("events.ts: nanos-long, LTZ and NTZ fixtures all normalize to identical session timestamps") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tables_").toString
    try {
      val epochMicros = Seq(
        (1L, 1704103200000000L), // 2024-01-01 10:00:00 UTC
        (2L, 1704114000000000L)) // 2024-01-01 13:00:00 UTC
      val src = epochMicros.toDF("event_id", "us")
      Seq(
        // the nanosAsLong session conf makes ns-precision parquet read
        // back as a bare long — written here as the long directly
        "long" -> src.select(col("event_id"), (col("us") * 1000L).as("ts")),
        "ltz"  -> src.select(col("event_id"),
          timestamp_micros(col("us")).as("ts")),
        "ntz"  -> src.select(col("event_id"),
          timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      ).foreach { case (flavor, df) =>
        val dir = s"$base/$flavor"
        df.write.parquet(s"$dir/events.parquet")
        val got = Tables.events(spark, dir)
        assert(got.schema("ts").dataType === TimestampType,
          s"flavor '$flavor' must normalize to session TIMESTAMP, " +
            s"got ${got.schema("ts").dataType}")
        val micros = got.select(col("event_id"), unix_micros(col("ts")))
          .as[(Long, Long)].collect().sortBy(_._1).toSeq
        assert(micros === epochMicros,
          s"flavor '$flavor' must preserve the epoch instants")
      }
    } finally rm(new java.io.File(base))
  }

  test("a genuinely unknown ts type passes through untouched (no silent coercion)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tables_").toString
    try {
      Seq((1L, "not-a-time")).toDF("event_id", "ts")
        .write.parquet(s"$base/events.parquet")
      // string is not a flavor Tables.events claims to normalize: it
      // must surface as-is so the consumer fails loudly on the type,
      // not on silently-wrong epoch values
      val got = Tables.events(spark, base)
      assert(got.schema("ts").dataType !== LongType)
      assert(got.schema("ts").dataType !== TimestampType)
    } finally rm(new java.io.File(base))
  }
}
