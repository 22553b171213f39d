package graft

import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

/** Coverage for the multimodal decode plumbing (north-star mandate):
  * the stub codec's contract (byte-derived dims, code-point checksum —
  * oracle-portable on non-ASCII), and partition-count invariance of
  * the typed mapPartitions stage.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeOne: byte-derived dims, code-point checksum, ASCII") {
    val payload = "hello world, this is a header and more".getBytes("UTF-8")
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaRecord(7L, payload))
    assert(f.media_id === 7L)
    assert(f.n_bytes === payload.length.toLong)
    assert(f.width === 64L + payload.length % 512L)
    assert(f.height === 64L + (payload.length / 7L) % 512L)
    val expect = "hello world, thi".map(_.toLong).sum % 997L
    assert(f.checksum === expect)
  }

  test("decodeOne: non-ASCII payload — checksum over code points, size over bytes") {
    val text = "한글 텍스트 metadata follows here ok"
    val payload = text.getBytes("UTF-8")
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaRecord(1L, payload))
    assert(f.n_bytes === payload.length.toLong) // 3 bytes per Hangul char
    assert(f.n_bytes > text.length)
    val expect = text.codePoints().limit(16).asLongStream().sum() % 997L
    assert(f.checksum === expect)
  }

  test("sampleFrames: one-to-many fan-out, chunked checksums, maxFrames cap") {
    val text = "a" * 70 // 70 chars → ceil(70/32) = 3 frames (cap 4)
    val df = Seq((5L, text)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = MultimodalOps.sampleFrames(df, "doc_id", "payload", 32, 4)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq === Seq(0L, 1L, 2L))
    assert(out(0)._3 === (32L * 'a') % 997L)
    assert(out(2)._3 === (6L * 'a') % 997L) // short tail frame
    // cap: a long payload yields exactly maxFrames
    val long = Seq((6L, "b" * 1000)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    assert(MultimodalOps.sampleFrames(long, "doc_id", "payload", 32, 4)
      .count() === 4L)
  }

  test("extractFeatures: matches decodeOne row-wise at any partition count") {
    val rows = Seq((1L, "short"), (2L, "a somewhat longer payload body"),
      (3L, "третий документ с юникодом"))
    val df = rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val expect = rows.map { case (id, t) =>
      val f = MultimodalOps.decodeOne(
        MultimodalOps.MediaRecord(id, t.getBytes("UTF-8")))
      (f.media_id, f.n_bytes, f.width, f.height, f.checksum)
    }.toSet
    Seq(1, 4).foreach { parts =>
      val out = MultimodalOps.extractFeatures(df.repartition(parts), "doc_id", "payload")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(out === expect, s"mismatch at $parts partitions")
    }
  }

  test("sampleFrames: bounded-prefix decode matches the full decode past the framed range") {
    import spark.implicits._
    // r14 review: the flatMap decoded the ENTIRE payload into a
    // code-point array per record to checksum a few dozen characters.
    // Parity pin: a payload far larger than maxFrames*chunk — with a
    // multi-byte char straddling the prefix cut — yields the same
    // frames as the character-indexed definition.
    val head = "ab¢def€hij" * 10 // 100 code points, multibyte inside
    val payload = (head + ("z" * 100000))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = MultimodalOps.sampleFrames(
        Seq((1L, payload)).toDF("id", "bin"), "id", "bin",
        chunk = 7, maxFrames = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    val cps = (head + "z").codePoints().toArray // enough for 3×7
    val expect = (0 until 3).map { fi =>
      (1L, fi.toLong,
        cps.slice(fi * 7, fi * 7 + 7).map(_.toLong).sum % 997L)
    }
    assert(out.toSeq === expect, s"got ${out.toSeq}")
  }

  test("writeBinaryFiles sweeps AGED tmp residue but spares fresh tmps " +
       "(another session's in-flight write, r15 ADVICE)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_export_tmp_").toString
    try {
      // a "dead attempt" from a previous job: uuid-named, never moved,
      // back-dated past the sweep age
      val old = java.nio.file.Paths.get(dir, ".old.bin.deadbeef.tmp")
      java.nio.file.Files.write(old, Array[Byte](1))
      java.nio.file.Files.setLastModifiedTime(old,
        java.nio.file.attribute.FileTime.from(java.time.Instant.now()
          .minus(MultimodalOps.tmpSweepAge.plusMinutes(1))))
      // a FRESH tmp: indistinguishable from a concurrent session's
      // in-flight write — the sweep must leave it alone (deleting it
      // would fail that session's rename mid-job)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, ".live.bin.cafebabe.tmp"), Array[Byte](2))
      // a tmp that VANISHES between list and stat (r15 review): its
      // owner's atomic move, or a concurrent sweep, can remove it
      // mid-iteration. A dangling symlink makes the stat throw
      // NoSuchFileException deterministically — the sweep must treat
      // "gone" as done, not fail the whole export.
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(dir, ".gone.bin.0ddba11.tmp"),
        java.nio.file.Paths.get(dir, "never-existed"))
      MultimodalOps.writeBinaryFiles(
        Seq(("new.bin", Array[Byte](5))).toDF("name", "payload"),
        "name", "payload", dir)
      val names = new java.io.File(dir).listFiles.map(_.getName).toSet
      assert(names === Set("new.bin", ".live.bin.cafebabe.tmp",
          ".gone.bin.0ddba11.tmp"),
        s"aged residue reclaimed, fresh tmp spared, vanished tmp skipped: $names")
    } finally {
      graft.ops.FsOps.rmTree(new java.io.File(dir))
    }
  }

  test("re-export deletes the target of a record whose payload became " +
       "NULL or empty (r15 ADVICE): no stale bytes on an accreting dir)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_export_re_").toString
    try {
      // first export: two live payloads
      MultimodalOps.writeBinaryFiles(
        Seq(("a.bin", Array[Byte](1, 2)), ("b.bin", Array[Byte](3)))
          .toDF("name", "payload"), "name", "payload", dir)
      // re-export over the SAME dir: a's payload became NULL, b's empty.
      // Skip-only semantics would leave both old files serving stale
      // bytes; the export must make the dir track the current dataset.
      MultimodalOps.writeBinaryFiles(
        Seq(("a.bin", null: Array[Byte]), ("b.bin", Array.empty[Byte]),
            ("c.bin", Array[Byte](9)))
          .toDF("name", "payload"), "name", "payload", dir)
      val names = new java.io.File(dir).listFiles.map(_.getName).toSet
      assert(names === Set("c.bin"),
        s"NULL/empty payloads delete their previous export: $names")
    } finally {
      graft.ops.FsOps.rmTree(new java.io.File(dir))
    }
  }

  test("dup names collapse to ONE deterministic record before I/O " +
       "(r16 ADVICE): write/delete never race on a shared target") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_export_dup_").toString
    try {
      // the dupfacts shape: same name twice, one payload NULL. Before
      // the collapse, task order decided whether d.bin existed after
      // the export (NULL's delete vs the write's atomic move). The
      // contract: greatest payload wins; NULL/empty deletes only when
      // the name has NO non-empty payload. Repartition spreads the
      // dup rows across tasks to give the old race its best shot.
      MultimodalOps.writeBinaryFiles(
        Seq(("d.bin", null: Array[Byte]), ("d.bin", Array[Byte](1, 2)),
            ("e.bin", Array[Byte](3)), ("e.bin", Array[Byte](4)),
            ("f.bin", null: Array[Byte]), ("f.bin", Array.empty[Byte]))
          .toDF("name", "payload").repartition(6), "name", "payload", dir)
      val names = new java.io.File(dir).listFiles.map(_.getName).toSet
      assert(names === Set("d.bin", "e.bin"),
        s"NULL beside a live payload must not delete; all-NULL/empty must: $names")
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "d.bin")).toSeq === Seq[Byte](1, 2))
      // greatest-payload winner is deterministic regardless of row order
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "e.bin")).toSeq === Seq[Byte](4))
    } finally {
      graft.ops.FsOps.rmTree(new java.io.File(dir))
    }
  }

  test("writeBinaryFiles rejects data-controlled unsafe names; sampleFrames rejects chunk=0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_export_").toString
    try {
      for (bad <- Seq("../escape.bin", "a/b.bin", "..", null)) {
        val df = Seq((bad, Array[Byte](1, 2))).toDF("name", "payload")
        val e = intercept[Exception] {
          MultimodalOps.writeBinaryFiles(df, "name", "payload", dir)
        }
        assert(e != null)
      }
      // and a safe name still round-trips
      MultimodalOps.writeBinaryFiles(
        Seq(("ok.bin", Array[Byte](7, 8, 9))).toDF("name", "payload"),
        "name", "payload", dir)
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "ok.bin")).toSeq === Seq[Byte](7, 8, 9))
      intercept[IllegalArgumentException] {
        MultimodalOps.sampleFrames(
          Seq((1L, Array[Byte](1))).toDF("id", "bin"), "id", "bin", 0, 4)
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
