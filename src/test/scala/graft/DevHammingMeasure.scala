package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (not a test): Hamming-distance margins of 64-bit
  * SimHash on the planted near-dup corpus — max distance over planted
  * pairs vs min distance over all cross pairs — to pick a verify
  * threshold for q30 with a deterministic safety margin on the fixture.
  *
  * Run: sbt 'Test/runMain graft.DevHammingMeasure /root/testdata/sf0.01'
  */
object DevHammingMeasure {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    // the +100000 planted-dup offset (shared with the graded queries)
    // only tags pairs correctly if ids never reach it — assert, don't
    // assume (ADVICE round 4)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    require(maxId < 100000L,
      s"planted-dup offset collides: max(doc_id)=$maxId >= 100000")
    val dup = docs.select((col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" graftdup")).as("text"))
    val corpus = docs.unionByName(dup)
      .select(col("doc_id"),
        TextOps.simhash64(TextOps.tokens(col("text"))).as("h"))
      .cache()

    val a = corpus.select(col("doc_id").as("ida"), col("h").as("ha"))
    val b = corpus.select(col("doc_id").as("idb"), col("h").as("hb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("ham", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .withColumn("planted", col("idb") === col("ida") + 100000L)

    println("=== planted pairs hamming distribution ===")
    pairs.filter(col("planted"))
      .agg(min("ham"), expr("percentile(ham, 0.5)"), max("ham"), count(lit(1)))
      .show(false)
    println("=== organic (non-planted) min / histogram below 20 ===")
    pairs.filter(!col("planted"))
      .agg(min("ham"), count(lit(1))).show(false)
    pairs.filter(!col("planted") && col("ham") <= 20)
      .groupBy("ham").count().orderBy("ham").show(30, false)
    spark.stop()
  }
}
