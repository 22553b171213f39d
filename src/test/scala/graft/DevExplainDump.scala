package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dev tool (r21 optimization round): dump `.explain("formatted")` for a
  * list of registered queries to files — the judge-facing plan evidence
  * (`plans/r21/<query>_{before,after}.txt`).
  *
  * Usage: Test/runMain graft.DevExplainDump <outDir> <suffix> <q1,q2,...> [sfDir]
  *
  * Uses the BENCH session shape (shuffle partitions = SPARK_GRAFT_CPUS,
  * same extensions/conf) so the dumped plans are the ones the bench
  * actually executes, not a strawman at a different parallelism.
  */
object DevExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      // q113's registered frame is the eagerly-executed result
      // (LocalTableScan) — the real join plan lives in skewJoinFrame,
      // dumped under this pseudo-name with the query's skew configs on
      def frame = n match {
        case "q113_inner" =>
          graft.queries.MaintainQueries.withSkewConfigs(spark)(
            graft.queries.MaintainQueries.skewJoinFrame(spark, sfDir))
        case _ => SparkEntry.queries(n)(spark, sfDir)
      }
      val txt =
        try frame.queryExecution.explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
