package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only q23 stage profiler (test scope): times the aggregation and
  * window stages of q23_topk under different arithmetic widths so the
  * round-5 fix targets the measured cost, not the suspected one.
  * `sbt "Test/runMain graft.DevProfileQ23"`
  */
object DevProfileQ23 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def li = Tables.lineitem(spark, sfDir)

    def time(label: String)(f: => Long): Unit = {
      // median of 3, matching the bench methodology
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"$label%-34s $med%6.2fs  rows=${ts.head._2}")
    }

    li.count() // warm-up

    val price = col("l_extendedprice").cast(DecimalType(18, 2))
    val disc = col("l_discount").cast(DecimalType(18, 2))

    // stage A: the aggregation alone, different widths
    def aggCount = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(count(lit(1)).as("_rev"))
    def aggDouble = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("_rev"))
    def aggDec38 = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(price * (lit(1).cast(DecimalType(18, 2)) - disc)).as("_rev"))
    def aggDec18 = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum((price * (lit(1).cast(DecimalType(18, 2)) - disc))
        .cast(DecimalType(18, 4))).as("_rev"))

    time("agg count-only")(aggCount.count())
    time("agg double sum")(aggDouble.count())
    time("agg decimal(38,4) sum [current]")(aggDec38.count())
    time("agg decimal(18,4) sum [fix?]")(aggDec18.count())

    // stage B: window on top of each agg
    def topk(rev: DataFrame): Long = {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("_rev").desc, col("l_partkey"))
      rev.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("l_suppkey"), col("l_partkey"),
          col("_rev").cast("double").as("revenue"),
          col("rk").cast("long").as("rk"))
        .count()
    }
    time("full q23 decimal(38,4) [current]")(topk(aggDec38))
    time("full q23 decimal(18,4) [fix?]")(topk(aggDec18))
    time("full q23 double")(topk(aggDouble))

    // stage C: decimal(18,4) agg + window ranked on a double mirror
    // (exact: revenues are scale-4 integers < 2^53, so decimal→double
    // is injective and order-preserving here)
    def topkMirror(rev: DataFrame): Long = {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("_rev").cast("double").desc, col("l_partkey"))
      rev.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("l_suppkey"), col("l_partkey"),
          col("_rev").cast("double").as("revenue"),
          col("rk").cast("long").as("rk"))
        .count()
    }
    time("full q23 dec(18,4)+dbl mirror")(topkMirror(aggDec18))

    spark.stop()
  }
}
