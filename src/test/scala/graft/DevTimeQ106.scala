package graft
import org.apache.spark.sql.SparkSession
object DevTimeQ106 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.extensions","graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    Tables.events(spark, d).count()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries("q106_variant_extract")(spark, d).count()
      println(f"q106 rep$i: ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
