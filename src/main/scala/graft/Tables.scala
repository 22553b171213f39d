package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark reads
    * only as a long (spark.sql.legacy.parquet.nanosAsLong, set by the
    * Verify/Bench/test sessions). Re-derive a proper timestamp via
    * integer `div` — a double division would lose precision above
    * 2^53 ns (~1970+104 days).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
