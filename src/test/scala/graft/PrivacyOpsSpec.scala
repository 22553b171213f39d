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

  test("band: floor semantics incl. negatives") {
    import spark.implicits._
    val out = Seq(1863.84, -10.5, 0.0, 999.99, 1000.0).toDF("v")
      .select(PrivacyOps.band(col("v"), 1000.0).as("b"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, -1L, 0L, 0L, 1L))
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

  test("kAnonymize: class count joins back broadcast") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 7, s"s${i % 3}")).toDF("g", "s")
    val plan = PrivacyOps.kAnonymize(df, Seq("g", "s"), 5L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
