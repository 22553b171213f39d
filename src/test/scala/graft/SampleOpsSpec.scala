package graft

import graft.ops.{RelationalOps, SampleOps}
import org.apache.spark.sql.functions._

class SampleOpsSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else "ko"))
      .toDF("doc_id", "lang")
  }

  test("hashSplit: deterministic, total, and proportional") {
    val a = SampleOps.hashSplit(docs, "doc_id", "split",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val b = SampleOps.hashSplit(docs, "doc_id", "split",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    // identical assignment across runs (no rand anywhere)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val byName = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum == 1000, "every row must land in exactly one split")
    // multiplicative hash ≈ uniform: 80/10/10 within a loose tolerance
    assert(byName("train") > 700 && byName("train") < 900, s"train=$byName")
    assert(byName("val") > 50 && byName("val") < 160, s"val=$byName")
    assert(byName("test") > 50 && byName("test") < 160, s"test=$byName")
  }

  test("hashSplit: split is a pure projection — no exchange in the plan") {
    val p = SampleOps.hashSplit(docs, "doc_id", "split",
        Seq("train" -> 90, "test" -> 10))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"split must not shuffle:\n$p")
  }

  test("stratifiedSample: per-stratum rates, deterministic, subset of input") {
    val s1 = SampleOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 50), defaultPct = 10)
    val s2 = SampleOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 50), defaultPct = 10)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    val n = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 334 en docs at 50% ≈ 167; 666 ko docs at 10% ≈ 67
    assert(n("en") > 120 && n("en") < 220, s"en=$n")
    assert(n("ko") > 30 && n("ko") < 110, s"ko=$n")
    // sampling at 100% must be the identity on that stratum
    val full = SampleOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 100), defaultPct = 0)
    assert(full.count() == docs.filter(col("lang") === "en").count())
  }

  test("saltedJoin: result is exactly the plain inner join, via a shuffled hash join") {
    import spark.implicits._
    // fact with a deliberately hot key (id 7 carries half the rows)
    val fact = (0L until 2000L)
      .map(i => (if (i % 2 == 0) 7L else i % 50L, i.toDouble))
      .toDF("k", "v")
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")
    val salted = RelationalOps.saltedJoin(fact, dim, "k", salts = 8)
    val plain = fact.join(dim, "k")
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0,
      "salted join must be result-identical to the plain join")
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"salted join should be a shuffled hash join (no sort, no broadcast):\n$p")
  }

  test("hashSplit property: partition of the id space for arbitrary split tables") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // arbitrary percentage tables summing to 100, arbitrary id ranges
    val gen = for {
      a <- Gen.choose(1, 98)
      b <- Gen.choose(1, 99 - a)
      lo <- Gen.choose(0L, 1000000L)
      n <- Gen.choose(1, 400)
    } yield (a, b, 100 - a - b, lo, n)
    (0 until 10).foreach { i =>
      val (a, b, c, lo, n) =
        gen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val ids = (lo until lo + n).toDF("doc_id")
      val out = SampleOps.hashSplit(ids, "doc_id", "split",
        Seq("x" -> a, "y" -> b, "z" -> c))
      // total: every row gets exactly one non-null split
      assert(out.filter(col("split").isNull).count() == 0,
        s"unassigned rows for splits ($a,$b,$c)")
      assert(out.count() == n)
      // stable under re-evaluation on a differently-partitioned input
      val out2 = SampleOps.hashSplit(ids.repartition(7), "doc_id", "split",
        Seq("x" -> a, "y" -> b, "z" -> c))
      assert(out.exceptAll(out2).count() == 0,
        "assignment must not depend on physical partitioning")
    }
  }

  test("bucket domain: huge and negative keys stay in [0, buckets) — no overflow wrap") {
    import spark.implicits._
    val extremes = Seq(0L, 1L, Long.MaxValue, Long.MaxValue - 1,
      3474749660L /* first key that would overflow key*Phi */,
      -1L, Long.MinValue).toDF("doc_id")
    val b = extremes.select(SampleOps.bucket(col("doc_id"), 100).as("b"))
      .as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 100),
      s"bucket escaped [0,100): ${b.mkString(",")}")
    // and the split stays total over the same extremes
    val s = SampleOps.hashSplit(extremes, "doc_id", "split",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(s.filter(col("split").isNull).count() == 0)
  }

  test("null key: NULL split from hashSplit, dropped by stratifiedSample — the documented contract") {
    // r14 review: the oracle twins used to end in a bare ELSE 'test',
    // which would have assigned every null-key row to the test split
    // while the engine yields NULL (no key, no hash, no deterministic
    // assignment — SampleOps.bucket doc). Both sides now agree on
    // NULL; this pins the engine half.
    import spark.implicits._
    val df = Seq((Some(1L), "en"), (None: Option[Long], "ko"))
      .toDF("doc_id", "lang")
    val split = SampleOps.hashSplit(df, "doc_id", "split",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect().map(r => Option(r.get(0)) -> Option(r.getString(2))).toMap
    assert(split(Some(1L)).isDefined, "a real key gets a split")
    assert(split(None).isEmpty, "a NULL key must yield a NULL split, never 'test'")
    val kept = SampleOps.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 100), defaultPct = 100).count()
    assert(kept === 1L,
      "NULL bucket < pct is NULL → the null-key row drops from samples")
  }

  test("string keys fail fast instead of silently null-bucketing the corpus away") {
    import spark.implicits._
    val df = Seq(("doc_ab12", "en"), ("doc_cd34", "ko")).toDF("id", "lang")
    intercept[IllegalArgumentException] {
      SampleOps.hashSplit(df, "id", "split", Seq("train" -> 80, "val" -> 20))
    }
    intercept[IllegalArgumentException] {
      SampleOps.stratifiedSample(df, "id", "lang", Map.empty, 10)
    }
  }

  test("salted decisions decorrelate: sample-then-split does not collapse into one split") {
    import spark.implicits._
    // same-salt composition keeps exactly the rows under BOTH cuts —
    // a 20% sample split 80/10/10 landed entirely in "train"
    val ids = (1L to 5000L).toSeq.toDF("id")
    val sampled = SampleOps.stratifiedSample(
      ids.withColumn("s", lit("x")), "id", "s", Map.empty, 20, salt = 7L)
    val splits = SampleOps.hashSplit(sampled, "id", "split",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = 99L)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.keySet === Set("train", "val", "test"),
      s"a salted split of a salted sample must populate every band: $splits")
    // and the default salt keeps the committed assignment (oracle parity)
    val d0 = SampleOps.bucket(col("id"), 100)
    val dExplicit = SampleOps.bucket(col("id"), 100, 0L)
    val same = ids.select((d0 === dExplicit).as("eq")).agg(min(col("eq")))
      .collect().head.getBoolean(0)
    assert(same)
  }

  test("profileColumns: one row per column with exact null/distinct/min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a"))
    ).toDF("id", "s")
    val prof = RelationalOps.profileColumns(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(prof("id") == ((0L, 4L, "1", "4")))
    assert(prof("s") == ((1L, 2L, "a", "b")))
    // all-null column: distinct must NOT count the null group
    val allNull = Seq((1L, None: Option[String]), (2L, None))
      .toDF("id", "s")
    val p2 = RelationalOps.profileColumns(allNull, Seq("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(p2("s") == ((2L, 0L, null, null)))
  }
}
