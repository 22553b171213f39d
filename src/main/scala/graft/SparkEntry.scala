package graft

import graft.ops.RelationalOps._
import graft.queries.{ExtQueries, NorthQueries, RefQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship pipeline (SURVEY.md §3 Entry-2 shape) on sf0.001:
    * scan facts → store×day aggregate → mart rename → latest-wins
    * merge (idempotent re-run) → broadcast dim enrichment → IN-list
    * constant fill. One aggregation shuffle + one merge shuffle; dims
    * broadcast — the plan a 1000-executor cluster would want.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val daily = Tables.orders(spark, d)
      .groupBy(col("o_custkey"), col("o_orderdate").cast("date").as("sale_dy"))
      .agg(sumMoney(col("o_totalprice")).as("chong_maechool"),
        count(lit(1)).as("pay_count"))
    val mart = renameProject(daily, Seq(
      "o_custkey" -> "chain_no", "sale_dy" -> "sale_dy",
      "chong_maechool" -> "chong_maechool", "pay_count" -> "pay_count"))
    // Idempotent re-run: merging the mart with itself must be a no-op.
    val merged = upsertLatestWins(mart, mart, Seq("chain_no", "sale_dy"))
    val dim = Tables.customer(spark, d)
      .select(col("c_custkey").as("chain_no"), col("c_mktsegment"))
      .withColumn("responsible",
        when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
          .otherwise(col("c_mktsegment")))
      .drop("c_mktsegment")
    val enriched = merged.withColumn("responsible", lit(null).cast("string"))
    val filled = enrichJoinOverwrite(enriched, dim, "chain_no",
      "responsible", "responsible")
    inListNullFill(filled, "responsible", "chain_no", Seq(1L, 2L, 3L), "직영")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ NorthQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, LSH internals) → driver records rows-only.
    */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ NorthQueries.oracle ++ ExtQueries.oracle
}
