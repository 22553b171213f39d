package graft
import org.apache.spark.sql.SparkSession
/** Dev: smoke the round-4 new/changed queries at sf0.01. */
object DevSmokeR4 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q50_simhash_neardup", "q51_nightly_window",
        "q52_dsv2_sink_upsert", "q53_jdbc_roundtrip",
        "q29_minhash_lsh_neardup", "q35_ann_ivf", "q37_ngram_jaccard_join")) {
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(q)(spark, d).count()
        println(f"SMOKE $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.1fs")
      } catch { case e: Throwable =>
        println(s"SMOKE $q FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
