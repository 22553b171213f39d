package graft

import graft.ops.PrivacyOps
import org.apache.spark.sql.functions._

class PrivacyOpsSpec extends SparkSpec {

  test("pseudonym: stable, peppered, 64-hex") {
    import spark.implicits._
    val df = Seq("alice", "bob", "alice").toDF("name")
      .select(PrivacyOps.pseudonym(col("name"), "p1").as("t"))
    val ts = df.collect().map(_.getString(0))
    assert(ts(0) == ts(2), "same input → same token")
    assert(ts(0) != ts(1), "different input → different token")
    assert(ts.forall(t => t.length == 64 && t.matches("[0-9a-f]+")))
    // pepper changes every token (dictionary inversion defense)
    val other = Seq("alice").toDF("name")
      .select(PrivacyOps.pseudonym(col("name"), "p2").as("t"))
      .collect().head.getString(0)
    assert(other != ts(0))
  }

  test("maskMiddle: keeps prefix/suffix, stars the middle, short-safe") {
    import spark.implicits._
    val out = Seq("Customer#000000123", "abcd", "ab", "")
      .toDF("s")
      .select(PrivacyOps.maskMiddle(col("s"), 9, 3).as("m"))
      .collect().map(_.getString(0))
    assert(out(0) == "Customer#******123")
    assert(out(1) == "abcd") // shorter than prefix: kept as-is, no stars
    assert(out(2) == "ab")
    assert(out(3) == "")
  }

  test("maskMiddle: lengths inside (prefix, prefix+suffix] keep the TRUE tail") {
    import spark.implicits._
    // the old fixed suffix start duplicated prefix chars and dropped
    // the real tail for values in this band ("abc" (2,2) -> "abb")
    val out = Seq(("abc", 2, 2), ("abcdefghij", 9, 3), ("abcdefghijk", 9, 3))
      .map(_._1).toDF("s")
    val m22 = out.limit(1).select(PrivacyOps.maskMiddle(col("s"), 2, 2))
      .collect().head.getString(0)
    assert(m22 === "abc", s"nothing to mask at len 3 (2,2): got $m22")
    val m93 = Seq("abcdefghij", "abcdefghijk").toDF("s")
      .select(PrivacyOps.maskMiddle(col("s"), 9, 3)).collect().map(_.getString(0))
    assert(m93(0) === "abcdefghij", s"len 10 (9,3): got ${m93(0)}")
    assert(m93(1) === "abcdefghijk", s"len 11 (9,3): got ${m93(1)}")
  }

  test("band: floor semantics incl. negatives") {
    import spark.implicits._
    val out = Seq(1863.84, -10.5, 0.0, 999.99, 1000.0).toDF("v")
      .select(PrivacyOps.band(col("v"), 1000.0).as("b"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, -1L, 0L, 0L, 1L))
  }

  test("band: non-finite values band to NULL, never to band 0 (r16 naninf probe)") {
    // Spark's floor() returns LONG, so floor(NaN) silently became 0 —
    // a NaN-balance row joined the genuine band-0 equivalence class
    // and the k-anonymity audit counted it as a real member
    import spark.implicits._
    val out = Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 500.0).toDF("v")
      .select(PrivacyOps.band(col("v"), 1000.0).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq === Seq(None, None, None, Some(0L)),
      "non-finite → NULL band (the 'unknown' class, same as NULL input)")
  }

  test("kAnonymize: small classes suppressed, audit k kept, nulls are a class") {
    import spark.implicits._
    // class (1, A) has 5 rows (kept), (2, B) has 2 (suppressed),
    // (null, C) has 3 (its own class, suppressed at k=5)
    val rows = Seq.fill(5)((1, "A")) ++ Seq.fill(2)((2, "B"))
    val df = rows.toDF("g", "s")
      .unionByName(Seq.fill(3)(("C")).toDF("s")
        .withColumn("g", lit(null).cast("int")).select(col("g"), col("s")))
    val out = PrivacyOps.kAnonymize(df, Seq("g", "s"), 5L)
    assert(out.count() == 10, "every input row survives")
    val kept = out.filter(col("g").isNotNull || col("s").isNotNull)
    assert(kept.count() == 5 &&
      kept.filter(col("k_class") === 5).count() == 5)
    // suppressed rows keep the audit trail
    assert(out.filter(col("s").isNull && col("k_class") === 2).count() == 2)
    assert(out.filter(col("s").isNull && col("k_class") === 3).count() == 3,
      "null quasi-identifier rows form their own class and join back")
  }

  test("kAnonymize property: the k-guarantee holds on random data") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the actual promise: among surviving (non-suppressed) rows, every
    // quasi-identifier combination appears at least minK times, and
    // no row is ever dropped (suppression nulls, it never filters)
    val gen = for {
      n <- Gen.choose(20, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 5); s <- Gen.oneOf("a", "b", "c")
      } yield (g, s))
      k <- Gen.choose(2L, 8L)
    } yield (rows, k)
    (0 until 6).foreach { i =>
      val (rows, k) = gen.pureApply(Gen.Parameters.default, Seed(41L + i))
      val df = rows.toDF("g", "s")
      val out = PrivacyOps.kAnonymize(df, Seq("g", "s"), k)
      assert(out.count() == rows.size, s"case $i: rows must never be filtered")
      val survivorClasses = out
        .filter(col("g").isNotNull && col("s").isNotNull)
        .groupBy("g", "s").count()
        .as[(Int, String, Long)].collect()
      survivorClasses.foreach { case (g, s, c) =>
        assert(c >= k, s"case $i: class ($g,$s) survives with $c < k=$k")
      }
      // and suppression is not over-eager: every class that met k survives
      val wantKept = rows.groupBy(identity).filter(_._2.size >= k).keys.toSet
      val gotKept = survivorClasses.map { case (g, s, _) => (g, s) }.toSet
      assert(gotKept === wantKept, s"case $i: kept-class set diverged")
    }
  }

  test("kAnonymize: one window shuffle, no join, no broadcast, no second scan") {
    import spark.implicits._
    // the audit's data is near-unique quasi-identifiers — |classes| ≈
    // |rows| — so the old broadcast-join-back formulation was the
    // wrong scale shape (and scanned the input twice); the window
    // form pays one hash exchange total
    val df = (1 to 100).map(i => (i % 7, s"s${i % 3}")).toDF("g", "s")
    val plan = PrivacyOps.kAnonymize(df, Seq("g", "s"), 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Broadcast"), plan)
    assert(plan.contains("Window"), plan)
    assert(plan.split("Exchange").length - 1 === 1,
      s"expected exactly one exchange:\n$plan")
  }

  test("gate configs that void the audit fail fast: minK < 1, no quasi cols, k_class collision, negative keeps") {
    // r14 review: a release gate that silently passes everything is
    // worse than no gate — these all used to be accepted quietly
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "q")
    intercept[IllegalArgumentException] {
      PrivacyOps.kAnonymize(df, Seq("q"), minK = 0)
    }
    intercept[IllegalArgumentException] {
      PrivacyOps.kAnonymize(df, Seq.empty, minK = 5)
    }
    intercept[IllegalArgumentException] { // silent audit-trail overwrite
      PrivacyOps.kAnonymize(
        PrivacyOps.kAnonymize(df, Seq("q"), minK = 1), Seq("q"), minK = 1)
    }
    intercept[IllegalArgumentException] { // corrupt-mask arithmetic
      PrivacyOps.maskMiddle(col("q"), -1, 3)
    }
  }

  test("band: zero width fails at build, not as silent NULL bands") {
    intercept[IllegalArgumentException] { PrivacyOps.band(col("v"), 0.0) }
  }
}
