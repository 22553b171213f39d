package graft

import graft.ops.AppScratch

/** Pins the per-application scratch registry (r15): eight graded
  * queries' round-trip sinks used to be named-and-forgotten —
  * 1,704 dead dirs in one day of rounds. The registry must keep the
  * legacy naming byte-for-byte (cross-session uniqueness and every
  * committed path assumption ride on it) and actually reclaim what it
  * handed out. Sweep mechanics run under a FAKE app id via the
  * register seam: sweeping the shared test session's real registry
  * would delete sinks other suites' returned frames still read
  * lazily.
  */
class AppScratchSpec extends SparkSpec {

  test("path keeps the legacy tmpdir/graft_<name>_<appId> naming and " +
       "records per app; bad names fail fast") {
    val appId = spark.sparkContext.applicationId
    val p = AppScratch.path(spark, "spec_sink")
    assert(p ===
      s"${System.getProperty("java.io.tmpdir")}/graft_spec_sink_$appId")
    // idempotent: same (app, name) → same path, recorded once
    assert(AppScratch.path(spark, "spec_sink") === p)
    assert(AppScratch.recorded(appId).contains(p))
    // a separator-bearing name would escape tmpdir
    intercept[IllegalArgumentException] {
      AppScratch.path(spark, "../escape")
    }
    intercept[IllegalArgumentException] { AppScratch.path(spark, "") }
  }

  test("sweep removes every recorded tree and forgets the app; " +
       "unrecorded (content-keyed) siblings survive") {
    val fakeApp = "spec-fake-app-0001"
    val a = AppScratch.register(fakeApp, "spec_sweep_a")
    val b = AppScratch.register(fakeApp, "spec_sweep_b")
    assert(a.endsWith(s"graft_spec_sweep_a_$fakeApp"),
      "register and path share one naming rule")
    for (p <- Seq(a, b)) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p, "gen=1"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p, "gen=1", "part-0"), Array[Byte](1))
    }
    // a content-keyed artifact next door, NOT via the registry
    val keyed = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_spec_v9_deadbeef")
    java.nio.file.Files.createDirectories(keyed)
    try {
      assert(AppScratch.recorded(fakeApp) === Set(a, b))
      AppScratch.sweep(fakeApp)
      assert(!new java.io.File(a).exists() && !new java.io.File(b).exists(),
        "recorded trees reclaimed recursively")
      assert(AppScratch.recorded(fakeApp).isEmpty, "registration forgotten")
      assert(java.nio.file.Files.exists(keyed),
        "unrecorded cross-session artifacts are never swept")
      // sweep is idempotent on a forgotten app
      AppScratch.sweep(fakeApp)
    } finally {
      graft.ops.FsOps.rmTree(keyed.toFile)
    }
  }

  test("listener install is decided by its own flag, never by the path " +
       "map (r15 ADVICE): register() first cannot suppress it") {
    // the old coupling: install piggybacked on byApp.computeIfAbsent,
    // so a register() under an app id BEFORE the first path() call
    // populated the map and the listener silently never installed —
    // that app's recorded sinks leaked again.
    val fake = "spec-fake-listener-app"
    AppScratch.register(fake, "spec_pre_install")   // byApp populated first
    assert(AppScratch.installFor(spark.sparkContext, fake),
      "install proceeds even though byApp already has the app")
    assert(!AppScratch.installFor(spark.sparkContext, fake),
      "second call is a no-op: exactly one listener per app")
    AppScratch.sweep(fake) // forget the registration; listener no-ops at end
  }
}
