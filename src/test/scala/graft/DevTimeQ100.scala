package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object DevTimeQ100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    Tables.events(spark, d).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to 3).foreach { i =>
      println(s"rep $i")
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_dev100_${i}_${System.nanoTime()}"
      val staged = s"$base/staged"
      val ev = Tables.events(spark, d).select(col("user_id"), col("ts"), col("value"))
      t("stage")(ev.repartition(4).write.mode("overwrite").parquet(staged))
      val stream = spark.readStream.schema(spark.read.parquet(staged).schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
      val agg = stream
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("_amt"), count(lit(1)).as("n"))
        .select(col("user_id"), col("day"), col("_amt").cast("double").as("amt"), col("n"))
      val table = s"dev100_mart_${i}_${System.nanoTime()}"
      t("drain")(graft.streaming.StreamingOps
        .maintainMart(agg, table, Seq("user_id", "day"), s"$base/ckpt")
        .awaitTermination())
      t("read")(spark.read.format("graft.sources.UpsertSinkSource")
        .option("table", table).load().count())
      t("compact")(graft.sources.UpsertSinkSource.compact(spark, table))
      t("read2")(spark.read.format("graft.sources.UpsertSinkSource")
        .option("table", table).load().count())
    }
    spark.stop()
  }
}
