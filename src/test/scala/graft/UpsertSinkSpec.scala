package graft

import graft.sources.UpsertSinkSource
import org.apache.spark.sql.functions._

/** DSv2 write-tier semantics (SURVEY.md S6/S8/S9): keyed-upsert merge,
  * idempotent re-send, truncate-and-load, and the schema guard — the
  * reference's re-runnable nightly sink (load_sales_data.py:129-134)
  * as a first-class SupportsWrite table.
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.UpsertSinkSource"

  private def readBack(table: String): Set[(Long, String, Double)] =
    spark.read.format(fmt).option("table", table).load()
      .as[(Long, String, Double)].collect().toSet

  test("keyed append: merge by key, idempotent re-send, latest wins") {
    val t = "t_upsert_" + System.nanoTime()
    val b1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    b1.write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    b1.write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save() // re-send: must not duplicate
    assert(readBack(t) === Set((1L, "a", 10.0), (2L, "b", 20.0)))

    // partial update batch: key 2 overwritten, key 3 inserted, key 1 kept
    Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    assert(readBack(t) ===
      Set((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0)))
    UpsertSinkSource.drop(t)
  }

  test("floating merge keys follow SPARK key semantics: -0.0 merges " +
       "0.0, NaN merges NaN (r17 review pass 11, naninf lens)") {
    val t = "t_fkeys_" + System.nanoTime()
    // boxed java.lang.Double says -0.0 != 0.0 and bit-different NaNs
    // differ; Spark's grouping/joins say the opposite. Without keyOf
    // normalization the 0.0-keyed update lands in a DIFFERENT bucket
    // than the stored -0.0 row and never merges it.
    Seq((-0.0, "neg", 1.0), (Double.NaN, "nan1", 2.0))
      .toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    Seq((0.0, "pos", 10.0), (Double.NaN, "nan2", 20.0))
      .toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    val rows = spark.read.format(fmt).option("table", t).load()
      .as[(Double, String, Double)].collect()
    assert(rows.length === 2, s"zero/NaN keys must merge, got ${rows.toSeq}")
    assert(rows.collect { case (k, n, v) if k == 0.0 => (n, v) }.toSet ===
      Set(("pos", 10.0)))
    assert(rows.collect { case (k, n, v) if k.isNaN => (n, v) }.toSet ===
      Set(("nan2", 20.0)))
    UpsertSinkSource.drop(t)
  }

  test("NULL merge key is ONE well-defined key: idempotent re-send, " +
       "newest batch wins (documented divergence from the JDBC twin)") {
    val t = "t_nullkey_" + System.nanoTime()
    val b1 = Seq((Some(1L), "a", 1.0), (None, "nullkeyed", 2.0))
      .toDF("k", "name", "v")
    b1.write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    b1.write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save() // re-send: the null-keyed row must NOT duplicate
    Seq((Option.empty[Long], "nullkeyed_v2", 3.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save() // newest segment wins for the NULL key too
    val rows = spark.read.format(fmt).option("table", t).load()
      .as[(Option[Long], String, Double)].collect().toSet
    assert(rows === Set((Some(1L), "a", 1.0), (None, "nullkeyed_v2", 3.0)))
    UpsertSinkSource.drop(t)
  }

  test("overwrite: truncate-and-load replaces all previous state") {
    val t = "t_trunc_" + System.nanoTime()
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    Seq((9L, "z", 9.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("overwrite").save()
    assert(readBack(t) === Set((9L, "z", 9.0)))
    UpsertSinkSource.drop(t)
  }

  test("schema guard: appending a different schema fails, state survives") {
    val t = "t_schema_" + System.nanoTime()
    Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    val bad = intercept[Exception] {
      Seq((1L, 5L)).toDF("k", "other")
        .write.format(fmt).option("table", t).option("keys", "k")
        .mode("append").save()
    }
    assert(bad.getMessage != null)
    assert(readBack(t) === Set((1L, "a", 1.0)), "failed write mutated state")
    UpsertSinkSource.drop(t)
  }

  test("file-backed store: commits install manifests over bucketed spill files; no rows on the driver") {
    val t = "t_manifest_" + System.nanoTime()
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    val m1 = UpsertSinkSource.readManifest(t).get
    assert(m1.version === 1L && m1.segments.size === 1 && m1.keys === Seq("k"))
    Seq((2L, "b2", 2.5)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    val m2 = UpsertSinkSource.readManifest(t).get
    assert(m2.version === 2L && m2.segments.size === 2,
      "append must add a segment, not rewrite the table")
    // rows live in bucketed data files referenced by the manifest
    val dataFiles = m2.segments.flatMap(_.files.values.flatten)
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      assert(java.nio.file.Files.exists(
        UpsertSinkSource.tableDir(t).resolve("data").resolve(f)), s"missing $f")
    }
    // merge-on-read resolves newest-wins across segments
    assert(readBack(t) === Set((1L, "a", 1.0), (2L, "b2", 2.5)))
    // truncate-and-load resets the segment chain
    Seq((9L, "z", 9.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("overwrite").save()
    assert(UpsertSinkSource.readManifest(t).get.segments.size === 1)
    UpsertSinkSource.drop(t)
    assert(UpsertSinkSource.readManifest(t).isEmpty, "drop must remove the store")
  }

  test("compaction folds the segment chain to one; vacuum reclaims orphaned files") {
    val t = "t_compact_" + System.nanoTime()
    // 3 batches → 3 segments, with key overlap across batches
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    Seq((2L, "b2", 2.5), (3L, "c", 3.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    Seq((3L, "c2", 3.5)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    assert(UpsertSinkSource.readManifest(t).get.segments.size === 3)
    val before = readBack(t)
    assert(before === Set((1L, "a", 1.0), (2L, "b2", 2.5), (3L, "c2", 3.5)))

    UpsertSinkSource.compact(spark, t)
    val m = UpsertSinkSource.readManifest(t).get
    assert(m.segments.size === 1, "compaction must fold the chain to one segment")
    assert(m.keys === Seq("k"), "compaction must preserve the merge-key property")
    assert(readBack(t) === before, "compaction must not change table content")

    val dataDir = UpsertSinkSource.tableDir(t).resolve("data")
    val countFiles = () => java.nio.file.Files.list(dataDir).count()
    val live = m.segments.flatMap(_.files.values.flatten).toSet
    assert(countFiles() > live.size, "pre-vacuum: orphaned segment files remain on disk")
    UpsertSinkSource.vacuum(t)
    assert(countFiles() === live.size.toLong, "vacuum must keep exactly the referenced files")
    assert(readBack(t) === before, "vacuum must not touch live data")
    UpsertSinkSource.drop(t)
  }

  test("compact's minSegments duty cycle: below threshold is a no-op, at threshold it folds") {
    val t = "t_duty_" + System.nanoTime()
    Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    Seq((2L, "b", 2.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    Seq((1L, "a2", 1.5)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    assert(UpsertSinkSource.readManifest(t).get.segments.size === 3)
    // 3 segments < threshold 4: the amortizing caller (q52) must not
    // pay a full-table rewrite yet
    UpsertSinkSource.compact(spark, t, minSegments = 4)
    assert(UpsertSinkSource.readManifest(t).get.segments.size === 3,
      "below the duty-cycle threshold compact must be a no-op")
    Seq((3L, "c", 3.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    UpsertSinkSource.compact(spark, t, minSegments = 4)
    assert(UpsertSinkSource.readManifest(t).get.segments.size === 1,
      "at the threshold compact must fold the chain")
    assert(readBack(t) === Set((1L, "a2", 1.5), (2L, "b", 2.0), (3L, "c", 3.0)),
      "newest-wins content must survive the thresholded fold")
    UpsertSinkSource.drop(t)
  }

  test("bucket count is a first-write table property, settable via the buckets option") {
    val t = "t_buckets_" + System.nanoTime()
    (1L to 40L).map(i => (i, s"n$i", i.toDouble)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .option("buckets", "4").mode("append").save()
    val m = UpsertSinkSource.readManifest(t).get
    assert(m.buckets === 4)
    // appends inherit the layout even with a different option value
    Seq((41L, "x", 41.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .option("buckets", "16").mode("append").save()
    assert(UpsertSinkSource.readManifest(t).get.buckets === 4)
    assert(readBack(t).size === 41)
    UpsertSinkSource.drop(t)
  }

  test("keyless table is append-only: rows never merge, compaction keeps them all") {
    val t = "t_keyless_" + System.nanoTime()
    // identical rows across two batches — an append table must keep both
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).mode("append").save()
    Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).mode("append").save()
    val read = () => spark.read.format(fmt).option("table", t).load()
    assert(read().count() === 3L, "keyless append must not merge rows")
    assert(UpsertSinkSource.readManifest(t).get.keys === Nil)
    // the keys option round-trips through compact as ""; must stay Nil
    UpsertSinkSource.compact(spark, t)
    assert(UpsertSinkSource.readManifest(t).get.keys === Nil)
    assert(read().count() === 3L, "compaction must preserve keyless content")
    UpsertSinkSource.drop(t)
  }

  test("buckets option must be a positive int") {
    val t = "t_badbuckets_" + System.nanoTime()
    val df = Seq((1L, "a", 1.0)).toDF("k", "name", "v")
    Seq("0", "-8").foreach { b =>
      val e = intercept[Exception] {
        df.write.format(fmt).option("table", t).option("keys", "k")
          .option("buckets", b).mode("append").save()
      }
      assert(e.getMessage.contains("buckets"), s"buckets=$b must be rejected")
    }
    assert(UpsertSinkSource.readManifest(t).isEmpty, "rejected write must not commit")
  }

  test("merge keys must be atomic non-binary types; binary payload columns stay legal") {
    val t = "t_binkey_" + System.nanoTime()
    // BinaryType key: Array[Byte] hashes by identity — equal keys would
    // land in different buckets and never merge. Must be rejected.
    val binKey = intercept[Exception] {
      Seq((Array[Byte](1, 2), 1.0)).toDF("k", "v")
        .write.format(fmt).option("table", t).option("keys", "k")
        .mode("append").save()
    }
    assert(binKey.getMessage.contains("binary/complex"), binKey.getMessage)
    val arrKey = intercept[Exception] {
      Seq((Seq(1L, 2L), 1.0)).toDF("k", "v")
        .write.format(fmt).option("table", t).option("keys", "k")
        .mode("append").save()
    }
    assert(arrKey.getMessage.contains("binary/complex"), arrKey.getMessage)
    val noSuchKey = intercept[Exception] {
      Seq((1L, 1.0)).toDF("k", "v")
        .write.format(fmt).option("table", t).option("keys", "nope")
        .mode("append").save()
    }
    assert(noSuchKey.getMessage.contains("not a column"), noSuchKey.getMessage)
    assert(UpsertSinkSource.readManifest(t).isEmpty, "rejected write must not commit")

    // binary as a NON-key column is fine: only key equality is load-bearing
    Seq((1L, Array[Byte](1, 2)), (1L, Array[Byte](3, 4))).toDF("k", "payload")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    val rows = spark.read.format(fmt).option("table", t).load()
      .as[(Long, Array[Byte])].collect()
    assert(rows.length === 1 && rows.head._1 === 1L &&
      rows.head._2.toSeq === Seq[Byte](3, 4), "newest-wins merge on binary payload")
    UpsertSinkSource.drop(t)
  }

  test("compact holds the table lock: a concurrent append is never lost") {
    val t = "t_race_" + System.nanoTime()
    Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    Seq((2L, "b", 2.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    assert(UpsertSinkSource.readManifest(t).get.segments.size === 2)

    // interleave an append inside compact's read→install window: without
    // the table lock held across compact, this commit lands between the
    // snapshot and the overwrite and is silently discarded
    @volatile var appender: Thread = null
    UpsertSinkSource.compactInterleaveHook = () => {
      appender = new Thread(() =>
        Seq((3L, "c", 3.0)).toDF("k", "name", "v")
          .write.format(fmt).option("table", t).option("keys", "k")
          .mode("append").save())
      appender.start()
      // the interleave must actually HAPPEN for the test to prove
      // anything: wait until the append's commit is blocked on the
      // monitor THIS (compact) thread holds — BLOCKED alone could be
      // a transient unrelated monitor — and FAIL, not pass vacuously,
      // if it never gets there
      val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      def blockedOnUs: Boolean = {
        val info = tmx.getThreadInfo(appender.getId)
        info != null && info.getThreadState == Thread.State.BLOCKED &&
          info.getLockOwnerName == Thread.currentThread().getName
      }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!blockedOnUs && System.nanoTime() < deadline) Thread.sleep(10)
      assert(blockedOnUs,
        "append never reached the commit lock inside compact's critical section")
    }
    try UpsertSinkSource.compact(spark, t)
    finally UpsertSinkSource.compactInterleaveHook = () => ()
    appender.join(60000)
    assert(!appender.isAlive, "interleaved append must complete")
    assert(readBack(t) === Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)),
      "append racing compact must not be discarded")
    UpsertSinkSource.drop(t)
  }

  // the messages Spark wraps around a commit failure vary; flatten the chain
  private def causes(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).toSeq

  test("cross-process CAS: a second writer claiming the same version fails loudly") {
    val t = "t_xproc_cas_" + System.nanoTime()
    Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save() // table at v1
    // another driver JVM won the race to v2: on disk, that is exactly a
    // claimed `.v2` marker — the JVM-local monitor cannot see it
    java.nio.file.Files.createFile(UpsertSinkSource.tableDir(t).resolve(".v2"))
    val e = intercept[Exception] {
      Seq((2L, "b", 2.0)).toDF("k", "name", "v")
        .write.format(fmt).option("table", t).option("keys", "k")
        .mode("append").save()
    }
    assert(causes(e).exists(_.contains("concurrent writer")),
      s"expected a loud concurrent-writer failure, got: ${causes(e)}")
    assert(readBack(t) === Set((1L, "a", 1.0)),
      "the losing batch must not have changed the table")
    UpsertSinkSource.drop(t)
  }

  test("compact is pinned to its snapshot: a cross-process commit during the fold aborts the fold") {
    val t = "t_xproc_pin_" + System.nanoTime()
    Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    Seq((2L, "b", 2.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k").mode("append").save()
    // simulate an EXTERNAL writer (second driver JVM) committing inside
    // compact's snapshot→install window: it claims the next version and
    // advances the on-disk manifest — invisible to the in-JVM monitor
    UpsertSinkSource.compactInterleaveHook = () => {
      val dir = UpsertSinkSource.tableDir(t)
      val mf = dir.resolve("MANIFEST")
      val txt = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      java.nio.file.Files.createFile(dir.resolve(".v3"))
      java.nio.file.Files.write(mf, txt.replaceFirst("v=2", "v=3").getBytes("UTF-8"))
    }
    val e =
      try intercept[Exception] { UpsertSinkSource.compact(spark, t) }
      finally UpsertSinkSource.compactInterleaveHook = () => ()
    assert(causes(e).exists(m =>
      m.contains("expected version 2") && m.contains("at 3")),
      s"expected the stale fold to abort on the version pin, got: ${causes(e)}")
    // aborting the fold discarded nothing: both committed rows survive
    assert(readBack(t) === Set((1L, "a", 1.0), (2L, "b", 2.0)))
    UpsertSinkSource.drop(t)
  }

  test("read-back scan partitions the committed rows") {
    val t = "t_parts_" + System.nanoTime()
    (1L to 100L).map(i => (i, s"n$i", i.toDouble)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    val df = spark.read.format(fmt).option("table", t)
      .option("numPartitions", "4").load()
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100L)
    UpsertSinkSource.drop(t)
  }

  test("path-traversal table names are rejected; dotted names stay legal") {
    // "." and ".." pass the character class but resolve OUTSIDE the
    // store root — drop("..") would have walked-and-deleted tmpdir
    for (bad <- Seq(".", "..")) {
      val e = intercept[Exception] {
        Seq((1L, "a", 1.0)).toDF("k", "name", "v")
          .write.format(fmt).option("table", bad).option("keys", "k")
          .mode("append").save()
      }
      assert(causes(e).exists(_.contains("unsafe table name")),
        s"'$bad' must be rejected, got: ${causes(e)}")
    }
    val ok = "a.b_" + System.nanoTime() // interior dots are fine
    Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", ok).option("keys", "k")
      .mode("append").save()
    assert(readBack(ok) === Set((1L, "a", 1.0)))
    UpsertSinkSource.drop(ok)
  }

  test("vacuum keeps the version-claim ledger: a writer lagging 2+ versions still collides") {
    val t = "t_ledger_" + System.nanoTime()
    def send(v: Double): Unit =
      Seq((1L, "a", v)).toDF("k", "name", "v")
        .write.format(fmt).option("table", t).option("keys", "k")
        .mode("append").save()
    send(1.0); send(2.0) // table at v2, markers .v1 and .v2 claimed
    UpsertSinkSource.vacuum(t)
    val dir = UpsertSinkSource.tableDir(t)
    assert(java.nio.file.Files.exists(dir.resolve(".v1")) &&
      java.nio.file.Files.exists(dir.resolve(".v2")),
      "vacuum must not reclaim claim markers — deleting .v1 would let a " +
        "writer that read version 0 silently clobber both later commits")
    UpsertSinkSource.drop(t)
  }

  test("nullability-only schema differences do not reject an append") {
    val t = "t_nullab_" + System.nanoTime()
    val b1 = Seq((1L, "a", 10.0)).toDF("k", "name", "v") // k,v nullable=false
    b1.write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    // same logical columns via expressions that mark them nullable —
    // the join/aggregation shape every real nightly produces
    val b2 = Seq((2L, "b", 20.0)).toDF("k", "name", "v")
      .select(when(col("k") =!= 0L, col("k")).as("k"), col("name"),
        when(col("v") =!= 0.0, col("v")).as("v"))
    assert(b2.schema("k").nullable, "test setup: k must arrive nullable")
    b2.write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save() // must NOT throw schema mismatch
    assert(readBack(t) === Set((1L, "a", 10.0), (2L, "b", 20.0)))
    // a REAL shape difference still fails loudly
    val e = intercept[Exception] {
      Seq((1L, 5)).toDF("k", "extra")
        .write.format(fmt).option("table", t).option("keys", "k")
        .mode("append").save()
    }
    assert(causes(e).exists(_.contains("schema mismatch")))
    UpsertSinkSource.drop(t)
  }

  test("a plan outliving a truncate to a different schema fails loudly, not with garbage rows") {
    val t = "t_replan_" + System.nanoTime()
    Seq((1L, "a", 1.0)).toDF("k", "name", "v")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("append").save()
    val planned = spark.read.format(fmt).option("table", t).load() // schema pinned now
    // another writer truncate-loads a different layout under the plan
    Seq((1L, 7L)).toDF("k", "w")
      .write.format(fmt).option("table", t).option("keys", "k")
      .mode("overwrite").save()
    val e = intercept[Exception] { planned.count() }
    assert(causes(e).exists(_.contains("changed schema between plan time")),
      s"stale plan must fail loudly, got: ${causes(e)}")
    // a fresh read of the new layout works
    assert(spark.read.format(fmt).option("table", t).load()
      .as[(Long, Long)].collect().toSet === Set((1L, 7L)))
    UpsertSinkSource.drop(t)
  }
}
