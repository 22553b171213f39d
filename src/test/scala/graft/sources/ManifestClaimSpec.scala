package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The claim/release half of the manifest install CAS
  * (UpsertSinkSource.writeManifest), pinned at the package level where
  * the method is visible. The cross-process collision half is pinned in
  * UpsertSinkSpec ("cross-process CAS"); here: a claim whose INSTALL
  * fails must be released, or the table wedges behind a misleading
  * concurrent-writer error on every retry of the same version. Pure
  * file-level tests — no SparkSession.
  */
class ManifestClaimSpec extends AnyFunSuite {

  private def manifest(v: Long) = UpsertSinkSource.Manifest(
    v, buckets = 2, keys = Seq("k"),
    schema = new StructType().add("k", LongType),
    segments = Seq.empty)

  test("a failed install releases its version claim; the retry then succeeds") {
    val t = "t_claim_release_" + System.nanoTime()
    val dir = UpsertSinkSource.tableDir(t)
    try {
      Files.createDirectories(dir)
      // force the install's atomic move to fail AFTER the claim: a
      // non-empty directory squatting on the MANIFEST path makes
      // rename() throw, which is as good as any disk-full/IO error
      Files.createDirectories(dir.resolve("MANIFEST"))
      Files.write(dir.resolve("MANIFEST").resolve("squatter"), Array[Byte](1))
      intercept[Exception] {
        UpsertSinkSource.writeManifest(t, manifest(1L))
      }
      assert(!Files.exists(dir.resolve(".v1")),
        "the failed install must release its .v1 claim — a dangling " +
          "marker wedges every retry behind a concurrent-writer error")
      // clear the obstruction; the SAME version must now install
      Files.delete(dir.resolve("MANIFEST").resolve("squatter"))
      Files.delete(dir.resolve("MANIFEST"))
      UpsertSinkSource.writeManifest(t, manifest(1L))
      assert(UpsertSinkSource.readManifest(t).exists(_.version == 1L))
    } finally UpsertSinkSource.drop(t)
  }

  test("a lagging writer collides on the retained ledger even versions behind") {
    val t = "t_claim_lag_" + System.nanoTime()
    try {
      UpsertSinkSource.writeManifest(t, manifest(1L))
      UpsertSinkSource.writeManifest(t, manifest(2L))
      // a writer that snapshotted version 1 tries to install version 2
      // much later — .v2 is still on disk (vacuum never reclaims the
      // ledger), so the stale install fails loudly instead of
      // discarding the real version-2 commit
      val e = intercept[java.util.ConcurrentModificationException] {
        UpsertSinkSource.writeManifest(t, manifest(2L))
      }
      assert(e.getMessage.contains("concurrent writer"))
    } finally UpsertSinkSource.drop(t)
  }
}
