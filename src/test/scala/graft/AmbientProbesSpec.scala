package graft

/** The probe trio is the self-adjudication layer of every committed
  * bench and ladder line, so its contract is load-bearing for the
  * perf-evidence story even though it never touches query results:
  * probes must return sane positive timings, never throw (a probe
  * failure must not kill the run it instruments), and gcMillis must
  * be monotone so rep-loop deltas can't go negative.
  */
class AmbientProbesSpec extends SparkSpec {

  test("probes return positive finite timings and never throw") {
    val p = new AmbientProbes(spark)
    p.warmup()
    val cn = p.canary()
    val io = p.ioProbe()
    assert(cn > 0 && cn.isFinite, s"canary=$cn")
    assert(io > 0 && io.isFinite, s"io=$io")
    // warmed probes at fixture scale are sub-second on any sane host;
    // a multi-second reading here means the probe itself regressed
    // into doing real work (it must stay cheap enough to stamp 113x)
    assert(cn < 30, s"canary implausibly slow: $cn")
    assert(io < 30, s"io probe implausibly slow: $io")
  }

  test("gcMillis is monotone non-decreasing, so rep-loop deltas are >= 0") {
    val p = new AmbientProbes(spark)
    val g0 = p.gcMillis()
    assert(g0 >= 0)
    // allocate enough to plausibly tick a collection; monotonicity
    // must hold whether or not one happens
    var junk: Array[Array[Byte]] = Array.fill(64)(new Array[Byte](1 << 20))
    junk = null
    System.gc()
    val g1 = p.gcMillis()
    assert(g1 >= g0, s"gcMillis went backwards: $g0 -> $g1")
  }
}
