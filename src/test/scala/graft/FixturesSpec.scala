package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The fixture-content fingerprint is the adjudication anchor for
  * every cross-run comparison (bench lines, Verify dumps) and the
  * cache key for persisted ingest artifacts (q35 centroids, q56/q89
  * pairs/components) — so pin the properties those uses rely on:
  * deterministic on identical bytes, sensitive to any byte change,
  * and defined (not throwing) for absent tables.
  */
class FixturesSpec extends AnyFunSuite {

  private def withDir(f: String => Unit): Unit = {
    val d = Files.createTempDirectory("graft_fx_").toString
    try f(d) finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(d))
    }
  }

  test("identical bytes => identical fingerprint; any byte change flips it") {
    withDir { d =>
      val p = Paths.get(d, "documents.parquet")
      Files.write(p, Array[Byte](1, 2, 3, 4, 5))
      val fp1 = Fixtures.tableFingerprint(d, "documents")
      assert(fp1.matches("[0-9a-f]{8}"), s"hex fingerprint expected, got $fp1")
      assert(Fixtures.tableFingerprint(d, "documents") === fp1)
      // same content in a DIFFERENT directory: same fingerprint — the
      // key is the data, not the path (spec fixtures sharing content
      // share artifacts by design)
      withDir { d2 =>
        Files.write(Paths.get(d2, "documents.parquet"), Array[Byte](1, 2, 3, 4, 5))
        assert(Fixtures.tableFingerprint(d2, "documents") === fp1)
      }
      // a one-byte change must flip it (mtime changes too, so the
      // memo cannot serve the stale hash). The memo key truncates
      // mtime to millis, so FORCE a distinct stamp instead of
      // sleeping — a sleep raced coarse stamps under full-suite load
      Files.write(p, Array[Byte](1, 2, 3, 4, 6))
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(p).toMillis + 1000))
      assert(Fixtures.tableFingerprint(d, "documents") !== fp1)
    }
  }

  test("same-size SAME-mtime rewrite still flips the fingerprint " +
       "(r15 ADVICE residual narrowed by the head/stride/tail probe)") {
    // the coarse-mtime hazard: (size, mtime) identical across a
    // rewrite → the memo served the stale CRC. Force the worst case —
    // equal length, mtime pinned back to the original stamp — and
    // require the fingerprint to track the bytes anyway. Content
    // differs in the first block (fixtures are parquet: head/tail
    // carry magic + footer stats, so any real rewrite moves them).
    withDir { d =>
      val p = Paths.get(d, "documents.parquet")
      Files.write(p, Array[Byte](1, 2, 3, 4, 5))
      val t0 = Files.getLastModifiedTime(p)
      val fp1 = Fixtures.tableFingerprint(d, "documents")
      Files.write(p, Array[Byte](1, 2, 3, 4, 6))
      Files.setLastModifiedTime(p, t0) // same size, same mtime
      assert(Fixtures.tableFingerprint(d, "documents") !== fp1,
        "stale-CRC window: the content probe must re-key the memo")
      // and a file larger than one probe block: a tail-only change
      // (footer rewrite) must also re-key
      val big0 = Array.fill[Byte](10000)(7)
      Files.write(p, big0)
      Files.setLastModifiedTime(p, t0)
      val fpBig = Fixtures.tableFingerprint(d, "documents")
      val big1 = big0.clone(); big1(9999) = 8
      Files.write(p, big1)
      Files.setLastModifiedTime(p, t0)
      assert(Fixtures.tableFingerprint(d, "documents") !== fpBig)
      // and an INTERIOR-only change on a file big enough that head and
      // tail blocks are untouched (r16 ADVICE: a middle parquet-page
      // rewrite leaving footer stats byte-identical) — the 1/4, 1/2,
      // 3/4 stride samples must re-key the memo where head/tail can't
      val wide0 = Array.fill[Byte](40000)(9)
      Files.write(p, wide0)
      Files.setLastModifiedTime(p, t0)
      val fpWide = Fixtures.tableFingerprint(d, "documents")
      val wide1 = wide0.clone(); wide1(20000) = 10 // inside the size/2 sample
      Files.write(p, wide1)
      Files.setLastModifiedTime(p, t0)
      assert(Fixtures.tableFingerprint(d, "documents") !== fpWide,
        "interior rewrite invisible: stride samples must catch it")
    }
  }

  test("absent table is 'absent', not an exception (probe dirs in specs)") {
    withDir { d =>
      assert(Fixtures.tableFingerprint(d, "documents") === "absent")
      // combined fingerprint over a dir with no tables is still defined
      assert(Fixtures.fingerprint(d).matches("[0-9a-f]{8}"))
    }
  }

  test("directory fingerprints encode file boundaries — no cross-file collision") {
    // without a length in the per-file header, {a="1b:2"} and
    // {a="1", b="2"} hash the same byte stream and two different
    // fixtures would share a persisted-artifact cache key
    withDir { d =>
      val t = Paths.get(d, "documents.parquet")
      Files.createDirectory(t)
      Files.write(t.resolve("a"), "1b:2".getBytes("UTF-8"))
      val f1 = Fixtures.tableFingerprint(d, "documents")
      withDir { d2 =>
        val t2 = Paths.get(d2, "documents.parquet")
        Files.createDirectory(t2)
        Files.write(t2.resolve("a"), "1".getBytes("UTF-8"))
        Files.write(t2.resolve("b"), "2".getBytes("UTF-8"))
        assert(Fixtures.tableFingerprint(d2, "documents") !== f1)
      }
    }
  }

  test("combined fingerprint reacts to any one table changing") {
    withDir { d =>
      val np = Paths.get(d, "nation.parquet")
      Files.write(np, Array[Byte](9, 9))
      val f1 = Fixtures.fingerprint(d)
      Files.write(np, Array[Byte](9, 8))
      Files.setLastModifiedTime(np, java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(np).toMillis + 1000))
      assert(Fixtures.fingerprint(d) !== f1)
    }
  }
}
