package graft

import graft.ops.TemporalOps
import org.apache.spark.sql.functions._

/** Unit coverage for the temporal joins: as-of semantics on hand-built
  * frames (inclusive boundary, null when no prior build row, tie-break
  * determinism), and banded-vs-broadcast range-join equivalence —
  * including intervals that span multiple bands and end mid-band.
  */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest prior build row per key, inclusive at equal ts") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L) // before every build row
    ).toDF("user_id", "ts", "purchase_id")
    val build = Seq(
      (1L, ts("2024-01-01 09:30:00"), 11L),
      (1L, ts("2024-01-01 10:00:00"), 12L), // equal ts → visible (inclusive)
      (1L, ts("2024-01-01 11:59:00"), 13L),
      (2L, ts("2024-01-01 09:30:00"), 21L)  // after the only probe for user 2
    ).toDF("user_id", "ts", "click_id")

    val out = TemporalOps.asofJoin(probe, build, Seq("user_id"), "ts", "ts",
        payloadCols = Seq("click_id"), tieBreak = Seq("click_id"))
      .select("purchase_id", "click_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(out(100L) === Some(12L)) // equal-ts build row wins over 09:30
    assert(out(101L) === Some(13L))
    assert(out(200L) === None)      // no prior click → left-outer null
  }

  test("asofJoin tie-break among equal-time build rows is deterministic (largest wins)") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), 1L))
      .toDF("user_id", "ts", "purchase_id")
    val build = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5L),
      (1L, ts("2024-01-01 09:00:00"), 3L),
      (1L, ts("2024-01-01 09:00:00"), 9L)
    ).toDF("user_id", "ts", "click_id")
    val out = TemporalOps.asofJoin(probe, build, Seq("user_id"), "ts", "ts",
        payloadCols = Seq("click_id"), tieBreak = Seq("click_id"))
      .select("click_id").as[Long].head()
    // tieBreak sorts equal-ts build rows ascending; last() carries the max
    assert(out === 9L)
  }

  test("asofJoin carries multi-column payloads and keeps every probe column") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), "extra"))
      .toDF("k", "t", "note")
    val build = Seq((1L, ts("2024-01-01 09:00:00"), "b", 7.5))
      .toDF("k", "bt", "tag", "score")
    val out = TemporalOps.asofJoin(probe, build, Seq("k"), "t", "bt",
      payloadCols = Seq("tag", "score"), payloadPrefix = "prior_")
    assert(out.columns.toSeq === Seq("k", "t", "note", "prior_tag", "prior_score"))
    val row = out.as[(Long, java.sql.Timestamp, String, String, Double)].head()
    assert(row === ((1L, ts("2024-01-01 10:00:00"), "extra", "b", 7.5)))
  }

  test("rangeJoinBanded ≡ rangeJoinBroadcast, intervals spanning multiple bands") {
    val facts = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    val intervals = spark.range(0, 28).toDF("period_id")
      .withColumn("p_start",
        date_add(to_date(lit("1995-01-01")), (col("period_id") * 90).cast("int")))
      .withColumn("p_end",
        date_add(to_date(lit("1995-01-01")), (col("period_id") * 90 + 180).cast("int")))

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
        col("period_id"))).as[String].collect().sorted.toSeq

    val broad  = key(TemporalOps.rangeJoinBroadcast(
      facts, intervals, "l_shipdate", "p_start", "p_end"))
    // band widths around AND off the interval length, incl. one that
    // leaves interval ends mid-band
    for (bandDays <- Seq(30, 90, 180, 365)) {
      val banded = key(TemporalOps.rangeJoinBanded(
        facts, intervals, "l_shipdate", "p_start", "p_end", bandDays))
      assert(banded === broad, s"bandDays=$bandDays diverged")
    }
    assert(broad.nonEmpty)
  }

  test("rangeJoinBanded emits each qualifying pair exactly once") {
    val facts = Seq((1L, ts("1995-04-01 00:00:00"))).toDF("id", "t")
    // two overlapping intervals, both containing the fact; 10-day bands
    // force the 180-day intervals across ~18 bands each
    val intervals = Seq(
      (10L, java.sql.Date.valueOf("1995-01-01"), java.sql.Date.valueOf("1995-06-30")),
      (11L, java.sql.Date.valueOf("1995-03-01"), java.sql.Date.valueOf("1995-08-31"))
    ).toDF("period_id", "p_start", "p_end")
    val out = TemporalOps.rangeJoinBanded(facts, intervals, "t",
      "p_start", "p_end", 10)
    assert(out.count() === 2) // one row per (fact, interval), no band dups
  }

  test("asofJoin property: equals the brute-force latest-prior lookup on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowsGen = for {
      np <- Gen.choose(1, 25)
      nb <- Gen.choose(0, 25)
      probe <- Gen.listOfN(np, for {
        u <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 50L)
      } yield (u, t))
      build <- Gen.listOfN(nb, for {
        u <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 50L)
      } yield (u, t))
    } yield (probe, build)
    (0 until 8).foreach { i =>
      val (p, b) = rowsGen.pureApply(Gen.Parameters.default, Seed(19L + i))
      val probe = p.zipWithIndex.map { case ((u, t), j) =>
        (u, ts("2024-01-01 00:00:00").toInstant.plusSeconds(t * 60), j.toLong)
      }.map { case (u, inst, id) => (u, java.sql.Timestamp.from(inst), id) }
        .toDF("user_id", "ts", "probe_id")
      val build = b.zipWithIndex.map { case ((u, t), j) =>
        (u, java.sql.Timestamp.from(
          ts("2024-01-01 00:00:00").toInstant.plusSeconds(t * 60)), j.toLong)
      }.toDF("user_id", "ts", "payload_id")
      val got = TemporalOps.asofJoin(probe, build, Seq("user_id"), "ts", "ts",
          payloadCols = Seq("payload_id"), tieBreak = Seq("payload_id"))
        .select("probe_id", "payload_id")
        .as[(Long, Option[Long])].collect().toMap
      // brute-force reference: latest prior build row, ties -> max id
      val buildRows = b.zipWithIndex.map { case ((u, t), j) => (u, t, j.toLong) }
      p.zipWithIndex.foreach { case ((u, t), j) =>
        val expect = buildRows.filter(r => r._1 == u && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(j.toLong) === expect,
          s"case $i probe $j (user=$u,t=$t): got ${got(j.toLong)}, want $expect")
      }
    }
  }

  test("changeHistory collapses runs into validity intervals with open current row") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "a"), // same run
      (1L, ts("2024-01-01 11:00:00"), 3L, "b"), // change
      (1L, ts("2024-01-01 12:00:00"), 4L, "a"), // back to a → NEW run
      (2L, ts("2024-01-01 09:00:00"), 5L, "x")
    ).toDF("user_id", "ts", "event_id", "status_in")
    val h = TemporalOps.changeHistory(events, "user_id", "ts", "status_in",
        "event_id")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
      .collect()
    assert(h.length === 4)
    val u1 = h.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq === Seq("a", "b", "a"),
      "value returning to a prior state must open a NEW interval")
    assert(u1(0)._3 === ts("2024-01-01 09:00:00"))
    assert(u1(0)._4 === Some(ts("2024-01-01 11:00:00")),
      "valid_to = next interval's valid_from")
    assert(u1(2)._4.isEmpty && u1(2)._5, "last interval is open and current")
    assert(h.count(_._5) === 2, "exactly one current row per key")
  }

  test("changeHistory: transitions into and out of NULL are real changes") {
    // v =!= prev is NULL for A->null (the null row merged into the A
    // run) while prev.isNull spuriously split equal-value runs after
    // a null; the null-safe <=> + row_number form keeps all 3 runs
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 2L, null.asInstanceOf[String]),
      (1L, ts("2024-01-03 00:00:00"), 3L, "A"))
      .toDF("k", "t", "tie", "v")
    val out = TemporalOps.changeHistory(df, "k", "t", "v", "tie")
      .orderBy("valid_from")
      .select("status", "is_current").as[(Option[String], Boolean)]
      .collect().toSeq
    assert(out === Seq((Some("A"), false), (None, false), (Some("A"), true)),
      s"expected A / null / A validity intervals, got $out")
  }

  test("asofJoin: payload/probe column collision fails at build without a prefix") {
    val probe = Seq((1L, ts("2024-01-01 00:00:00"), 5.0)).toDF("k", "pt", "price")
    val build = Seq((1L, ts("2024-01-01 00:00:00"), 6.0)).toDF("k", "bt", "price")
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(probe, build, Seq("k"), "pt", "bt", Seq("price"))
    }
    // with a prefix the same shape is legal
    val ok = TemporalOps.asofJoin(probe, build, Seq("k"), "pt", "bt",
      Seq("price"), payloadPrefix = "asof_")
    assert(ok.columns.contains("asof_price"))
  }

  test("asofJoin: NULL build timestamps and NULL keys match nothing (join semantics)") {
    // r14 review: a null-ts build row sorted nulls-FIRST and its
    // payload was carried to every no-prior-match probe row; null keys
    // grouped together under window partitioning where a join would
    // never match them. Both now behave like the SQL join they stand
    // in for.
    val probe = Seq(
      (Some(1L), ts("2024-01-01 10:00:00"), 100L),
      (None: Option[Long], ts("2024-01-01 10:00:00"), 101L)
    ).toDF("user_id", "ts", "purchase_id")
    val build = Seq(
      (Some(1L), None: Option[java.sql.Timestamp], 11L), // null ts
      (None: Option[Long], Some(ts("2024-01-01 09:00:00")), 12L) // null key
    ).toDF("user_id", "ts", "click_id")
    val out = TemporalOps.asofJoin(probe, build, Seq("user_id"), "ts", "ts",
        payloadCols = Seq("click_id"))
      .select("purchase_id", "click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === None,
      "a NULL build ts satisfies no build.ts <= probe.ts — no match")
    assert(out(101L) === None,
      "NULL keys never match under join semantics; the probe row still emits")
  }

  test("asofJoin: a PREFIXED payload name colliding with a probe column fails at build") {
    // r14 review: a non-empty prefix used to short-circuit the guard
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), 5L))
      .toDF("user_id", "ts", "p_click_id")
    val build = Seq((1L, ts("2024-01-01 09:00:00"), 11L))
      .toDF("user_id", "ts", "click_id")
    val e = intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(probe, build, Seq("user_id"), "ts", "ts",
        payloadCols = Seq("click_id"), payloadPrefix = "p_")
    }
    assert(e.getMessage.contains("p_click_id"))
  }

  test("changeHistory: equal-timestamp runs split by tieCol get deterministic intervals") {
    // r14 review: two runs sharing a valid_from (an equal-ts value
    // change split by the tie column) were ordered by valid_from alone
    // — lead() picked an arbitrary winner and is_current flapped
    // between executions; _run now breaks the tie
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A", 1L),
      (1L, ts("2024-01-01 10:00:00"), "B", 2L) // same ts, later tie
    ).toDF("id", "ts", "status", "seq")
    val out = TemporalOps.changeHistory(df, "id", "ts", "status", "seq")
      .select("status", "valid_to", "is_current")
      .as[(String, Option[java.sql.Timestamp], Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("A") === ((Some(ts("2024-01-01 10:00:00")), false)),
      "the tie-earlier run closes at the shared timestamp")
    assert(out("B") === ((None, true)),
      "the tie-later run is current — deterministically, on every run")
  }

  test("changeHistory: a FULL (ts, tie) collision — two revisions of one " +
       "record — orders by the value itself (r16 dupfacts probe)") {
    // the redelivered-batch shape: same key, same ts, same tie column
    // (the revision re-uses the record id), different value. With the
    // order underdetermined there, which revision opened the run
    // flapped between engines; valueCol is now the last tiebreak, so
    // 'A' always precedes 'B' and the intervals are pinned.
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "B", 7L), // input order reversed
      (1L, ts("2024-01-01 10:00:00"), "A", 7L)  // on purpose
    ).toDF("id", "ts", "status", "seq")
    val out = TemporalOps.changeHistory(df, "id", "ts", "status", "seq")
      .select("status", "valid_to", "is_current")
      .as[(String, Option[java.sql.Timestamp], Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("A") === ((Some(ts("2024-01-01 10:00:00")), false)))
    assert(out("B") === ((None, true)),
      "value-order decides: the lexicographically later revision is current")
  }

  test("trailingAttribution: a negative window fails fast instead of attributing zero") {
    val src = Seq((1L, 10L)).toDS()
    val tgt = Seq((1L, 20L)).toDS()
    intercept[IllegalArgumentException] {
      TemporalOps.trailingAttribution(src, tgt, windowMicros = -1L)
    }
  }

  test("trailingAttribution: boundary inclusivity, no-source targets, unordered input") {
    val m = 60L * 1000000 // one minute in micros
    // sources (views) and targets (clicks) deliberately unsorted —
    // the op must sort per key, not assume input order
    val views = Seq((1L, 100 * m), (1L, 10 * m), (3L, 50 * m))
      .toDS()
    val clicks = Seq(
      (1L, 40 * m),  // latest view 10m → 30m gap → attributed at exactly the window
      (1L, 41 * m),  // 31m gap → NOT attributed
      (1L, 100 * m), // view AT the click instant → attributed
      (2L, 10 * m),  // user with zero views → unattributed
      (4L, 5 * m)    // ditto
    ).toDS()
    val out = TemporalOps
      .trailingAttribution(views, clicks, windowMicros = 30 * m)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 3L, 2L), (2L, 1L, 0L), (4L, 1L, 0L)),
      "user 3 (views only) must emit nothing; boundaries inclusive")
  }

  test("q95 builder is timestamp-flavor agnostic (TIMESTAMP vs TIMESTAMP_NTZ fixtures)") {
    // Round 9 lesson: the driver regenerates the parquet fixtures and
    // their timestamp columns can arrive as either TIMESTAMP (LTZ) or
    // TIMESTAMP_NTZ (naive micros) depending on the writer — and
    // unix_micros() hard-rejects NTZ, which silently dropped q95 from
    // a whole round's correctness gate. Pin: the graded builder
    // analyzes AND produces identical epoch arithmetic on both
    // flavors (under the suite's pinned UTC session timezone the two
    // encode the same instants).
    val base = java.nio.file.Files.createTempDirectory("graft_tsflavor_").toString
    try {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:20:00"), "click"), // within 30m → attributed
      (1L, ts("2024-01-01 12:00:00"), "click"), // no trailing view → not
      (2L, ts("2024-01-01 09:00:00"), "click")  // zero views
    ).toDF("user_id", "ts", "event_type")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    val results = Seq("timestamp" -> s"$base/ltz", "timestamp_ntz" -> s"$base/ntz")
      .map { case (flavor, dir) =>
        events.withColumn("ts", col("ts").cast(flavor))
          .write.parquet(s"$dir/events.parquet")
        val out = SparkEntry.queries("q95_cogroup_attrib")(spark, dir)
          .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
        flavor -> out
      }.toMap
    val expect = Seq((1L, 2L, 1L), (2L, 1L, 0L))
    assert(results("timestamp") === expect)
    assert(results("timestamp_ntz") === expect,
      "NTZ fixture must yield the same attribution as LTZ")
    } finally { // don't leak a fixture dir per run
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(base))
    }
  }

  test("changeHistory runs in ONE exchange (windows and run collapse share the key partitioning)") {
    val events = Seq((1L, ts("2024-01-01 09:00:00"), 1L, "a"))
      .toDF("user_id", "ts", "event_id", "v")
    val p = TemporalOps.changeHistory(events, "user_id", "ts", "v", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1,
      s"SCD2 history must reuse one key exchange end to end, saw $exchanges:\n$p")
  }
}
