package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev probe: how many Spark jobs do candidate sentinels and bare
  * builder steps actually launch? (Calibrates LazyRegistrySpec.)
  */
object DevJobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val n = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { n.incrementAndGet(); () }
    })
    def measure(label: String)(f: => Unit): Unit = {
      Thread.sleep(300); val before = n.get()
      f
      Thread.sleep(1000)
      println(s"[probe] $label -> ${n.get() - before} jobs")
    }
    measure("rdd parallelize count")(spark.sparkContext.parallelize(Seq(1)).count(): Unit)
    measure("range(1).count")(spark.range(1).count(): Unit)
    measure("read.parquet customer (build only)")(
      spark.read.parquet("/root/testdata/sf0.001/customer.parquet"): Unit)
    measure("read.parquet customer again")(
      spark.read.parquet("/root/testdata/sf0.001/customer.parquet"): Unit)
    measure("Tables.customer")(Tables.customer(spark, "/root/testdata/sf0.001"): Unit)
    measure("q01 build")(SparkEntry.queries("q01_scan_project")(spark, "/root/testdata/sf0.001"): Unit)
    measure("q10 build")(SparkEntry.queries("q10_date_range")(spark, "/root/testdata/sf0.001"): Unit)
    measure("q105 build")(SparkEntry.queries("q105_recursive_cte")(spark, "/root/testdata/sf0.001"): Unit)
    spark.stop()
  }
}
