package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Per-application scratch sinks, reclaimed at application end.
  *
  * Eight graded queries (q19/q41/q43/q60/q67/q70/q92 and the flagship
  * entry mart) write a round-trip sink under java.io.tmpdir named
  * `graft_<name>_<applicationId>` — unique per app so concurrent
  * sessions never overwrite each other. Unique also meant LEAKED:
  * nothing ever deleted them, and one day of round activity left
  * 1,704 dead sink dirs / ~3 GB in /tmp (r15 ledger). On a long-lived
  * cluster gateway the same pattern accretes per submitted app
  * forever — an operational bug, not a tidiness nit.
  *
  * This registry keeps the exact legacy path naming (plan shapes and
  * cross-session uniqueness unchanged) and adds the missing half of
  * the lifecycle: every path handed out is recorded per application,
  * and a SparkListener registered once per app sweeps the recorded
  * paths on `onApplicationEnd` (posted by SparkContext.stop before
  * the listener bus drains, so the sweep runs exactly when no job of
  * this app can still read them). Deliberately NOT a JVM shutdown
  * hook: multiple sessions in one JVM (the test suite) each reclaim
  * their own app's paths at their own stop.
  *
  * Crash residue (no ApplicationEnd) still leaks — the same bound as
  * every staged write here — but the steady-state leak, clean run
  * after clean run, is closed. Content-keyed cross-session artifacts
  * (`graft_*_v*_<fingerprint>`) never come through this registry and
  * are never swept.
  */
object AppScratch {

  private val byApp =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Set[String]]()

  /** Apps whose cleanup listener is installed — tracked SEPARATELY
    * from the path map (r15 ADVICE): registration used to piggyback on
    * byApp's computeIfAbsent, so a register() call under the live
    * application id BEFORE the first path() call would populate the
    * map and silently suppress the listener — that app's sinks leaked
    * again. Listener installation now has its own flag, keyed only by
    * "did path() see this app yet".
    */
  private val listenerApps =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Scratch dir path `tmpdir/graft_<name>_<applicationId>`, recorded
    * for end-of-app reclamation. Callers create/write it themselves —
    * this only names and tracks it. Idempotent per (app, name).
    */
  def path(spark: SparkSession, name: String): String = {
    installFor(spark.sparkContext, spark.sparkContext.applicationId): Unit
    register(spark.sparkContext.applicationId, name)
  }

  /** Install the end-of-app sweep listener for `appId` if not yet
    * installed; returns whether THIS call installed it. Set.add is
    * atomic, so exactly one caller per app installs — and the decision
    * reads only [[listenerApps]], never byApp, by construction. Split
    * out of [[path]] so the spec can pin the decoupling under a fake
    * app id (a fake-id listener at app end sweeps an empty
    * registration — a no-op).
    */
  private[graft] def installFor(sc: org.apache.spark.SparkContext,
                                appId: String): Boolean = {
    val installed = listenerApps.add(appId)
    if (installed) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          listenerApps.remove(appId): Unit
          sweep(appId)
        }
      })
    }
    installed
  }

  /** Naming + bookkeeping half of [[path]], keyed by an explicit app
    * id and registering NO listener — the spec seam (a test can
    * exercise register/sweep under a fake app id without touching the
    * shared session's registration or stopping its context).
    */
  private[graft] def register(appId: String, name: String): String = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"scratch name must be [A-Za-z0-9_]+, got '$name'")
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$appId"
    byApp.computeIfAbsent(appId,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
      .add(p): Unit
    p
  }

  /** Best-effort delete of every path recorded for `appId` and forget
    * the registration. rmTree semantics (FsOps): cleanup at shutdown
    * must never throw over the app's own outcome.
    */
  private[graft] def sweep(appId: String): Unit =
    Option(byApp.remove(appId)).foreach { set =>
      set.forEach(p => FsOps.rmTree(new java.io.File(p)))
    }

  /** Paths currently recorded for an app — spec visibility only. */
  private[graft] def recorded(appId: String): Set[String] = {
    val s = byApp.get(appId)
    if (s == null) Set.empty
    else { val b = Set.newBuilder[String]; s.forEach(b += _); b.result() }
  }
}
