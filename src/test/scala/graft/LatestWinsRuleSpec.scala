package graft

import graft.ops.RelationalOps.upsertLatestWins
import org.apache.spark.sql.functions._

/** The LatestWinsRule optimizer rewrite (injected by GraftExtensions,
  * so it is live in this shared session exactly as in Verify/Bench):
  * row_number()=1 latest-wins plans must become min_by aggregates —
  * and only when provably equivalent.
  */
class LatestWinsRuleSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1L, "old_a", 10), (2L, "old_b", 20))
    .toDF("k", "v", "n")
  private def incoming = Seq((2L, "new_b", 21), (3L, "new_c", 30))
    .toDF("k", "v", "n")

  test("upsertLatestWins is rewritten to an aggregate (no Window, partial agg present)") {
    val out = upsertLatestWins(target, incoming, Seq("k"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window survived the rewrite:\n$p")
    assert(p.contains("Aggregate"), s"expected an aggregate plan:\n$p")
    assert(p.contains("partial_min_by") || p.contains("partial_minby"),
      s"map-side partial aggregation is the point of the rewrite:\n$p")
  }

  test("rewritten upsert result is exactly the latest-wins merge") {
    val got = upsertLatestWins(target, incoming, Seq("k"))
      .as[(Long, String, Int)].collect().toSet
    assert(got === Set((1L, "old_a", 10), (2L, "new_b", 21), (3L, "new_c", 30)))
  }

  test("rule refuses nullable order keys (null placement not provably equivalent)") {
    val df = Seq((1L, Some("b"), 1), (1L, None, 2), (2L, Some("a"), 3))
      .toDF("k", "ord", "payload")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("ord"))
    val out = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Window"),
      s"rule must NOT fire on a nullable order key:\n$p")
    // and the window semantics stand: nulls first under ASC
    assert(out.select("k", "payload").as[(Long, Int)].collect().toSet ===
      Set((1L, 2), (2L, 3)))
  }

  test("rule refuses descending order (only ASC is proven against struct ordering)") {
    val df = Seq((1L, 5, "x"), (1L, 9, "y")).toDF("k", "ord", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("ord").desc)
    val out = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"rule must NOT fire on DESC order:\n$p")
    assert(out.select("v").as[String].collect().toSeq === Seq("y"))
  }

  test("global windows (no partitionBy) are untouched — empty-input semantics differ") {
    // parquet-backed so the filter's emptiness is a RUNTIME fact the
    // optimizer cannot fold away (a literal Seq would collapse to an
    // empty LocalTableScan before the rule even sees a Window)
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select(col("n_nationkey").as("ord"), col("n_name").as("v"))
      .filter(col("ord") > 1000)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ord"))
    val out = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    assert(out.queryExecution.executedPlan.toString.contains("Window"),
      "rule must NOT fire on a global window")
    // the bug this guards: an ungrouped min_by aggregate would emit
    // one all-null row here instead of zero rows
    assert(out.count() === 0)
  }

  test("rank-k windows (k>1) are untouched") {
    val df = Seq((1L, 1, "a"), (1L, 2, "b"), (1L, 3, "c")).toDF("k", "ord", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("ord"))
    val out = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 2).drop("_rn")
    assert(out.queryExecution.executedPlan.toString.contains("Window"))
    assert(out.count() === 2)
  }

  test("multi-column order with tiebreak rewrites and picks the same row as the window") {
    // order keys must be non-nullable for the rule to fire — Long/Int
    // tuple columns are; String columns are nullable and refuse (above)
    val dup = Seq((1L, 11L, 0, "keep"), (1L, 11L, 1, "drop"),
      (1L, 10L, 9, "first")).toDF("k", "ts", "pri", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("ts"), col("pri"))
    val out = dup.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "non-nullable multi-key ASC order must rewrite")
    assert(out.select("v").as[String].collect().toSeq === Seq("first"))
  }
}
