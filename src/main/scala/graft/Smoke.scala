package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: replicates the driver's t1 check (entry rows>0)
  * and prints a sample. `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TIMESTAMP_MICROS, not the INT96 default (r18 nulltime probe):
      // INT96 stores any instant, but pyarrow-based consumers (the
      // driver's compare included) force-read INT96 as NANOSECONDS and
      // a post-2262 timestamp silently WRAPS (9999-12-31 came back as
      // 1816-03-30). Micros is also the modern, stats-pushable type.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.orderBy("chain_no", "sale_dy").show(5, truncate = false)
    spark.stop()
  }
}
