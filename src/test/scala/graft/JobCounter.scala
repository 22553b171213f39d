package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Shared FIFO-settled Spark-job counter for tests (r20 ADVICE item 4:
  * three verbatim copies had grown across LazyRegistrySpec,
  * NightlyRunSpec and DevNightlySoak — and the copied settle() returned
  * as soon as ANY job-start event landed after its mark, so a BODY
  * job's event still in flight on the listener bus could satisfy the
  * wait before the sentinel's own event was counted, undercounting one
  * window and overcounting the next. This settle waits for the
  * SENTINEL'S OWN event, identified by a unique job-group tag: the
  * listener bus delivers events in order, so once the sentinel's start
  * event has arrived, every job started before it has been counted.)
  */
final class JobCounter(sc: SparkContext) extends AutoCloseable {
  private val jobStarts = new AtomicInteger(0)
  private val seen =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val listener = new SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobStarts.incrementAndGet()
      val g = Option(j.properties)
        .map(_.getProperty("spark.jobGroup.id")).orNull
      if (g != null && g.startsWith(JobCounter.Tag)) { seen.add(g); () }
    }
  }
  sc.addSparkListener(listener)

  /** Run one tagged sentinel job (exactly ONE Spark job — an RDD count,
    * no AQE) and wait until ITS start event has been delivered. Returns
    * the running count INCLUDING the sentinel.
    */
  def settle(): Int = {
    val tag = JobCounter.Tag + java.util.UUID.randomUUID().toString
    // job groups are thread-local: tagging scopes to this sentinel only
    sc.setJobGroup(tag, "job-counter settle sentinel")
    try { sc.parallelize(Seq(1)).count(): Unit }
    finally sc.clearJobGroup()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!seen.contains(tag) && System.nanoTime() < deadline)
      Thread.sleep(5)
    require(seen.contains(tag), "sentinel job event never arrived")
    jobStarts.get()
  }

  /** Jobs started during `body`, excluding the settling sentinels. */
  def counted[A](body: => A): (A, Int) = {
    val mark = settle()
    val a = body
    (a, settle() - mark - 1) // minus the closing settle's sentinel
  }

  override def close(): Unit = sc.removeSparkListener(listener)
}

object JobCounter {
  private[graft] val Tag = "graft-settle-"
}
