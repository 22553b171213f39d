package graft
import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DevPlantedHam {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      val h = docs.select(col("doc_id"),
        TextOps.simhash64(TextOps.tokens(col("text"))).as("h"))
      val hd = docs.select(col("doc_id"),
        TextOps.simhash64(TextOps.tokens(concat(col("text"), lit(" graftdup")))).as("h"))
      val planted = h.as("a").join(hd.as("b"), "doc_id")
        .select(bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("ham"))
      println(s"=== $d planted hamming ===")
      planted.agg(min("ham"), expr("percentile(ham, 0.5)"), max("ham"), count(lit(1))).show(false)
    }
    spark.stop()
  }
}
