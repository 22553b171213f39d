package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time q54 (JDBC MERGE upsert) standalone at the bench SF —
  * guards against the indexless nested-loop regression recurring.
  * `sbt "Test/runMain graft.DevTimeQ54"`
  */
object DevTimeQ54 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.orders(spark, sfDir).count() // warm-up
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q54_jdbc_upsert")(spark, sfDir).count()
      println(f"q54 rep$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    spark.stop()
  }
}
