package graft.ops

/** The one recursive-delete helper (r14 review: five verbatim copies
  * had grown across StagedArtifact, Materialize, NightlyRun,
  * OpsQueries and CurateQueries — a fix to any of them had to land
  * five times or the copies silently diverged).
  */
object FsOps {

  /** Best-effort recursive delete: idempotent, tolerant of concurrent
    * deleters (listFiles() returning null — IO error or a tmp cleaner
    * racing the listing — is treated as already-gone; this often runs
    * in finally blocks, where an NPE would mask the original failure).
    * Failures are deliberately silent: every caller is either
    * reclaiming its OWN residue (losing race branches, shutdown
    * hooks) or immediately followed by an operation that fails loudly
    * if the tree still stands. Callers needing the loud contract use
    * [[rmTreeOrThrow]].
    */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(): Unit
  }

  /** Total bytes of regular files under a tree — filesystem metadata
    * only, no Spark job, so builders may call it at query-construction
    * time (LazyRegistrySpec's no-job contract). Used to derive
    * scale-adaptive partition counts from data actually on disk
    * (q100's state-store sizing); a missing path sizes as 0.
    */
  def treeBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(treeBytes).sum).getOrElse(0L)

  /** Recursive delete that fails LOUDLY if the tree still stands
    * afterwards (held handle, permissions, NFS residue) — for callers
    * whose next step silently corrupts state when the delete quietly
    * fails (e.g. a mart-commit retire sweep that then marks the slice
    * committed over surviving duplicate rows).
    */
  def rmTreeOrThrow(f: java.io.File): Unit = {
    rmTree(f)
    if (f.exists())
      throw new java.io.IOException(
        s"cannot delete ${f.getPath}: tree still present after delete")
  }
}
