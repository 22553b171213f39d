package graft

import graft.ops.ReconcileOps._
import org.apache.spark.sql.functions._

/** Reconciliation semantics + the two-sided migration proof SURVEY §2m
  * sells: after the flagship pipeline runs, an independent re-run's
  * mart must checksum byte-equal per partition (what a reference-to-
  * engine migration would publish as its acceptance evidence), and the
  * checksum must DETECT every class of divergence it claims to —
  * value drift, row loss, NULL-vs-empty, delimiter collisions.
  */
class ReconcileOpsSpec extends SparkSpec {
  import spark.implicits._

  private def marts() = {
    val m = SparkEntry.entry(spark)
    tableChecksum(m,
      Seq(canonField(col("chain_no")), canonField(col("sale_dy")),
        canonField(col("chong_maechool")), canonField(col("pay_count")),
        escaped(col("responsible"))),
      col("sale_month"))
  }

  test("migration proof: independent flagship runs checksum byte-equal per partition") {
    val a = marts().orderBy("part").collect()
    val b = marts().orderBy("part").collect()
    assert(a.nonEmpty, "flagship mart produced no partitions")
    assert(a.toSeq === b.toSeq,
      "re-running the pipeline must reproduce identical per-partition checksums")
  }

  test("checksum detects value drift and row loss in exactly the touched partition") {
    val base = Seq((1L, "2024-01", 10.0), (2L, "2024-01", 20.0), (3L, "2024-02", 30.0))
      .toDF("k", "month", "v")
    def ck(df: org.apache.spark.sql.DataFrame) =
      tableChecksum(df, Seq(canonField(col("k")), canonField(col("v"))), col("month"))
        .as[(String, Long, Long, Long)].collect().toMap2
    val ref = ck(base)
    val drift = ck(base.withColumn("v",
      when(col("k") === 2L, lit(20.01)).otherwise(col("v"))))
    assert(drift("2024-02") === ref("2024-02"), "untouched partition must not move")
    assert(drift("2024-01") !== ref("2024-01"), "value drift must move the checksum")
    val lost = ck(base.filter(col("k") =!= 3L))
    assert(lost.get("2024-02") !== ref.get("2024-02"),
      "losing a partition's only row must change (here: remove) its checksum row")
  }

  test("canonicalization: NULL vs empty and delimiter placement are digest-distinct") {
    def one(a: Option[String], b: String) = {
      val df = Seq((a, b)).toDF("a", "b")
      tableChecksum(df, Seq(escaped(col("a")), escaped(col("b"))), lit("p"))
        .select("checksum_hi", "checksum_lo").as[(Long, Long)].head()
    }
    assert(one(None, "x") !== one(Some(""), "x"),
      "NULL and '' must not collide (round-6 ADVICE)")
    assert(one(Some("a|b"), "c") !== one(Some("a"), "b|c"),
      "delimiter inside a field must not shift field boundaries")
    assert(one(None, "x") !== one(Some("\\N"), "x"),
      "the literal string \\N must not collide with SQL NULL (sentinel forgery)")
    assert(one(Some("a\\|b"), "c") !== one(Some("a|b"), "c"),
      "a literal backslash-pipe must not collide with an escaped pipe")
  }

  test("checksum is invariant to row order and physical partitioning") {
    // the order-INSENSITIVE claim itself: a migration compares two
    // systems that will never scan in the same order or partition
    // layout, so the digest must depend on the multiset of rows only
    val base = (1 to 200).map(i => (i.toLong, s"m${i % 3}", i * 1.5))
      .toDF("k", "month", "v")
    def ck(df: org.apache.spark.sql.DataFrame) =
      tableChecksum(df, Seq(canonField(col("k")), canonField(col("v"))), col("month"))
        .as[(String, Long, Long, Long)].collect().toMap2
    val ref = ck(base)
    assert(ck(base.repartition(7)) === ref,
      "repartitioning must not move any partition checksum")
    assert(ck(base.orderBy(desc("v"))) === ref,
      "row order must not move any partition checksum")
    assert(ck(base.repartition(13, col("k"))) === ref,
      "key-hash partitioning must not move any partition checksum")
  }

  private implicit class Tuple4Map(rows: Array[(String, Long, Long, Long)]) {
    def toMap2: Map[String, (Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("raw nullable fields cannot collide: (NULL,'x') and ('x',NULL) checksum differently") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // concat_ws SKIPS nulls, so without the boundary canonicalization
    // both rows rendered as "x" — equal checksum certifying unequal
    // content
    def sums(rows: Seq[(String, String)]) =
      graft.ops.ReconcileOps.tableChecksum(rows.toDF("a", "b"),
        Seq(col("a"), col("b")), lit("p"))
        .select("checksum_hi", "checksum_lo").as[(Long, Long)].collect().head
    assert(sums(Seq((null, "x"))) !== sums(Seq(("x", null))))
  }
}
