package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Source layer: parquet readers for the driver's test tables
  * (TESTDATA.md). At 100 TB these become date-partitioned parquet/ORC
  * directories or a DataSource V2 table; the query code is identical
  * because everything downstream is declarative DataFrame ops.
  *
  * Role mapping onto the reference's logical tables (SURVEY.md §7):
  * stores → `customer`, products → `part`, store×day facts →
  * `orders`/`lineitem`; `events`/`documents`/`embeddings` drive the
  * north-star LLM-pipeline operators.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): `spark.read.parquet` runs a
  // footer/schema-inference job on EVERY call, so an unmemoized
  // registry pays one listing job per table per query BUILD — pure
  // overhead repeated 113× per bench pass, and at 100 TB a re-listing
  // of a large directory tree per query. These dirs are read-only
  // test fixtures (TESTDATA.md); the returned frame is an immutable
  // logical plan, safe to share. (This also gives builders their
  // zero-jobs-at-construction contract — LazyRegistrySpec.)
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // lazy eviction: entries strongly pin their SparkSession (and its
    // analyzed plans); a JVM that churns sessions (spec suites, a
    // service recycling contexts) would otherwise accumulate stopped
    // sessions for its lifetime. O(entries) per call, entries ≤
    // |tables| × |live sessions| — trivial.
    frames.keySet.removeIf(k => k._1.sparkContext.isStopped)
    frames.computeIfAbsent((spark, sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever flavor the driver's fixture
    * writer chose THIS round, so normalize all of them to one session
    * timestamp (LTZ) here — every downstream consumer then reasons
    * about a single type instead of each remembering the drift story:
    *   - nanosecond-precision parquet: Spark reads it only as a long
    *     (spark.sql.legacy.parquet.nanosAsLong, set by the
    *     Verify/Bench/test sessions). Re-derive the timestamp via
    *     integer `div` — a double division would lose precision above
    *     2^53 ns (~1970+104 days).
    *   - TIMESTAMP_NTZ (the round-10 fixtures): epoch-equivalent to
    *     LTZ under the pinned UTC session timezone, but functions like
    *     unix_micros() hard-reject it (broke q95 in round 9's gate).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp_ltz"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
