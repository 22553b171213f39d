package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r21 dev harness: interleaved A/B of q100's stream-pipeline shuffle
  * partition count (state stores per micro-batch scale with it).
  * Usage: Test/runMain graft.DevTimeQ100AB [reps]
  */
object DevTimeQ100AB {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    Tables.events(spark, d).count()
    val parts = Seq("8", "4", "2")
    val acc = scala.collection.mutable.LinkedHashMap(
      parts.map(p => p -> List.empty[Double]): _*)
    var n = 0
    def runOnce(p: String): Double = {
      n += 1
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_dev100ab_${n}_${System.nanoTime()}"
      val ev = Tables.events(spark, d).select(col("user_id"), col("ts"), col("value"))
      val table = s"dev100ab_${n}_${System.nanoTime()}"
      graft.sources.UpsertSinkSource.dropOnExit(table)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      val t0 = System.nanoTime()
      try {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        ev.repartition(4).write.mode("overwrite").parquet(s"$base/staged")
        val stream = spark.readStream
          .schema(spark.read.parquet(s"$base/staged").schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$base/staged")
        val agg = stream
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum(col("value").cast(DecimalType(18, 2))).as("_amt"),
            count(lit(1)).as("n"))
          .select(col("user_id"), col("day"),
            col("_amt").cast("double").as("amt"), col("n"))
        graft.streaming.StreamingOps
          .maintainMart(agg, table, Seq("user_id", "day"), s"$base/ckpt")
          .awaitTermination()
        graft.sources.UpsertSinkSource.compact(spark, table)
        graft.sources.UpsertSinkSource.vacuum(table)
        spark.read.format("graft.sources.UpsertSinkSource")
          .option("table", table).load().count()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        graft.ops.FsOps.rmTree(new java.io.File(base))
      }
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up one full pipeline
    runOnce("8")
    (1 to reps).foreach { _ =>
      parts.foreach { p => acc(p) = runOnce(p) :: acc(p) }
    }
    acc.foreach { case (p, xs) =>
      println(f"parts=$p%-3s min=${xs.min}%6.3f med=${xs.sorted.apply(xs.size / 2)}%6.3f max=${xs.max}%6.3f")
    }
    spark.stop()
  }
}
