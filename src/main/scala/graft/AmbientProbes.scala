package graft

import org.apache.spark.sql.SparkSession

/** The three ambient-load probes stamped into bench and scale-ladder
  * lines, one per slowdown mechanism a shared sandbox has (the r11
  * flat-canary episode in SCALING.md is why one probe is not enough):
  *
  *   - `canary` — fixed CPU-only Spark job (no I/O, no table): external
  *     CPU load inflates it at least as much as any query (measured in
  *     the r11 load-injection experiment);
  *   - `io` — 8 MB fsync'd write + read-back in the Spark tmp dir
  *     (where shuffle spill, state stores, and sink tables live):
  *     host-side disk contention inflates it while the CPU canary
  *     stays flat;
  *   - `gcMillis` — this JVM's cumulative GC time; the delta across a
  *     rep loop exposes own-heap pressure that no external probe sees.
  *
  * Reading rule (tools/bench_adjudicate.py applies it mechanically):
  * query up + canary up = external CPU; + io up = disk; + gc up = own
  * heap; all flat with min moved = the query itself changed.
  *
  * Probes are deliberately cheap (~30–100 ms each at idle) so stamping
  * every query costs a few seconds across a 113-query run, and they
  * must NEVER kill the run they instrument — failures log to stderr
  * and return the elapsed time anyway.
  */
final class AmbientProbes(spark: SparkSession) {

  /** CPU probe. 2M ids: sum(id²) ≈ 2.7e18 stays under Long.Max (ANSI
    * overflow throws; 4M would exceed it).
    */
  def canary(): Double = {
    val t0 = System.nanoTime()
    try spark.range(2000000L).selectExpr("sum(id * id)").collect(): Unit
    catch { case e: Throwable =>
      System.err.println(s"[probe] canary failed: ${e.getMessage}")
    }
    (System.nanoTime() - t0) / 1e9
  }

  // per-INSTANCE probe file: a shared path let two concurrent
  // instrumented runs (Bench ∥ ladder, parallel suites) truncate each
  // other mid-read and fsync the same inode — corrupting the exact
  // signal the machine-state adjudication reads. Deleted on exit.
  private val ioFile = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir"),
    s"graft_bench_ioprobe_${java.util.UUID.randomUUID()}.bin")
  ioFile.toFile.deleteOnExit()
  private val ioBuf = new Array[Byte](8 * 1024 * 1024)

  /** Disk probe: write + fsync + read-back in the tmp dir. */
  def ioProbe(): Double = {
    val t0 = System.nanoTime()
    try {
      val ch = java.nio.channels.FileChannel.open(ioFile,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try { ch.write(java.nio.ByteBuffer.wrap(ioBuf)); ch.force(false) }
      finally ch.close()
      java.nio.file.Files.readAllBytes(ioFile): Unit
    } catch { case e: Throwable =>
      System.err.println(s"[probe] io probe failed: ${e.getMessage}")
    }
    (System.nanoTime() - t0) / 1e9
  }

  private val gcBeans =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans

  /** Cumulative GC milliseconds of this JVM; take a delta around a rep
    * loop to charge heap pressure to the queries that caused it.
    */
  def gcMillis(): Long = {
    var s = 0L
    gcBeans.forEach(b => { val t = b.getCollectionTime; if (t > 0) s += t })
    s
  }

  /** Warm-up plateau knobs (r17 VERDICT item 4). One untimed pass is
    * not enough on a cold JVM: the canary's own codegen/JIT maturity
    * made it read ~3× its warm value on an idle box (DevIsolated
    * warmN=0 arm: 0.415 vs 0.133 warm — r17 dose-response), so every
    * isolated-mode adjudication needed a "cold-JVM-biased" footnote.
    * Plateau = [[WarmPatience]] consecutive passes that fail to beat
    * the best reading by >5% (adjacent-pair tolerance would stop
    * early on a gradually-descending cold curve, where neighbors are
    * close while the floor is still falling); [[WarmMax]] bounds the
    * cost when ambient load never lets it settle (a few seconds worst
    * case, once per instrumented run). */
  private val WarmMax = 25
  private val WarmPatience = 3

  /** Untimed probe passes so probe-side codegen/JIT warm-up stays out
    * of the recorded series: the canary runs until its best reading
    * plateaus (or WarmMax passes), the io probe keeps its single
    * pass (syscall-dominated, not JIT-dominated).
    */
  def warmup(): Unit = {
    var best = canary()
    var noImprove = 0
    var i = 1
    while (noImprove < WarmPatience && i < WarmMax) {
      val c = canary()
      if (c < best * 0.95) { best = c; noImprove = 0 } else noImprove += 1
      i += 1
    }
    ioProbe(): Unit
  }
}
