package graft

import java.util.Properties

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: CERTIFY the q54 batching claim with a number (r18 VERDICT
  * item 6). The sf1 ladder measured the Derby MERGE sink linear at
  * Θ(rows) — expected, a JDBC upsert writes every row — and the code
  * comment in JdbcUpsert asserts the 100-TB shape amortizes that cost
  * with per-partition connections and large insert batches (the
  * writer's `batchsize` option; JdbcUpsert defaults it to 10000 over
  * Spark's 1000). This arm turns the comment into a measurement: the
  * same key-unique aggregate is merged into a fresh in-memory Derby
  * target at batchsize 10 / 100 / 1000 / 10000, three reps each,
  * interleaved (round-robin) so ambient drift lands evenly across
  * arms. Expected shape: wall time falls steeply 10→1000 and
  * plateaus by 10000 — per-batch JDBC round trips dominate at small
  * batches, and once the round-trip count stops mattering the
  * remaining cost is Derby's row path, which batching cannot remove.
  *
  * `SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.DevTimeQ54Batch"`
  */
object DevTimeQ54Batch {
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

    graft.sources.JdbcUpsert.ensureDerbyDialect()
    System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
    System.setProperty("derby.stream.error.file",
      System.getProperty("java.io.tmpdir") + "/derby.log")

    // q54's exact producer shape: per-customer aggregate, key-unique
    val daily = Tables.orders(spark, sfDir)
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("amt"), count(lit(1)).as("n"))
      .cache()
    val rows = daily.count() // materialize outside every timed region
    println(s"q54-batch arm: $rows key-unique rows from $sfDir")

    val sizes = Seq(10, 100, 1000, 10000)
    val times = scala.collection.mutable.Map.empty[Int, List[Double]]
    var run = 0
    for (rep <- 1 to 3; bs <- sizes) {
      run += 1
      val url = s"jdbc:derby:memory:q54batch_$run;create=true"
      val props = new Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      props.setProperty("batchsize", bs.toString)
      val t0 = System.nanoTime()
      // both MERGE arms, as graded: full-INSERT pass then full-UPDATE
      graft.sources.JdbcUpsert.mergeInto(
        daily.withColumn("amt", lit(0.0)), url, "mart", Seq("o_custkey"), props)
      graft.sources.JdbcUpsert.mergeInto(
        daily, url, "mart", Seq("o_custkey"), props)
      val dt = (System.nanoTime() - t0) / 1e9
      times(bs) = dt :: times.getOrElse(bs, Nil)
      println(f"rep$rep batchsize=$bs%5d ${dt}%6.2fs")
      // drop the in-memory DB so arms never share page cache or space
      try java.sql.DriverManager.getConnection(
        s"jdbc:derby:memory:q54batch_$run;drop=true")
      catch { case _: java.sql.SQLException => () } // drop signals via exception
    }
    println("\nbatchsize  min     med")
    sizes.foreach { bs =>
      val s = times(bs).sorted
      println(f"$bs%9d ${s.head}%6.2fs ${s(s.size / 2)}%6.2fs")
    }
    val speedup = times(10).min / times(10000).min
    println(f"\nmin-time speedup batchsize 10 -> 10000: ${speedup}%.2fx")
    spark.stop()
  }
}
