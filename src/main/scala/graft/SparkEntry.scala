package graft

import graft.ops.RelationalOps._
import graft.queries.{CurateQueries, DeepQueries, ExtQueries, HardenQueries, MaintainQueries, NorthQueries, OpsQueries, PipelineQueries, RefQueries, ServeQueries, WidenQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship pipeline — the reference's ACTUAL nightly shape
    * (SURVEY.md §3 Entry 2/3: kicc_to_tb_sales.py +
    * kicc_to_tb_sales_prod_period.py) end to end on sf0.001:
    *
    *   1. pre-existing mart target (history through 1996-06, with
    *      already-set enrichment values),
    *   2. DATE-BOUNDED fresh slice (S3 BETWEEN → parquet pushdown —
    *      the nightly job never rescans history),
    *   3. store×day aggregation of the slice (A1) + mart rename (P5),
    *   4. latest-wins MERGE of the bounded slice into the LARGER
    *      target (U1) — the overlap window (1996-01..06) is where
    *      incoming must beat stored rows; re-runs are idempotent,
    *   5. broadcast dim enrichment OVERWRITING stale pre-existing
    *      values where the dim matches, keeping them where it is null
    *      (J1's UPDATE…JOIN semantics), then IN-list constant fill (P3),
    *   6. date-partitioned mode("overwrite") write + re-read (S7/S8) —
    *      the atomic TRUNCATE replacement, partitioned so the next
    *      nightly slice prunes at the directory level.
    *
    * Two shuffles (slice agg, merge window); dims broadcast; the write
    * is partition-parallel — the plan a 1000-executor cluster wants.
    */
  def entry(spark: SparkSession): DataFrame = {
    // honor the driver-passed scale dir (same env contract as
    // Verify/Bench); sf0.001 is the documented smoke-check default
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    def storeDayMart(df: DataFrame): DataFrame = {
      val daily = df
        .groupBy(col("o_custkey"), col("o_orderdate").cast("date").as("sale_dy"))
        .agg(sumMoney(col("o_totalprice")).as("chong_maechool"),
          count(lit(1)).as("pay_count"))
      renameProject(daily, Seq(
        "o_custkey" -> "chain_no", "sale_dy" -> "sale_dy",
        "chong_maechool" -> "chong_maechool", "pay_count" -> "pay_count"))
    }

    // 1. pre-existing target: history through 1996-06-30, enrichment
    // already populated with a stale placeholder the dim must beat.
    val target = storeDayMart(Tables.orders(spark, d)
      .filter(col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00"))))
      .withColumn("responsible", lit("stale"))

    // 2-3. bounded fresh slice (overlaps the target Jan–Jun 1996).
    val slice = storeDayMart(Tables.orders(spark, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))))
      .withColumn("responsible", lit(null).cast("string"))

    // 4. one-shuffle MERGE: incoming slice wins on overlapping days.
    val merged = upsertLatestWins(target, slice, Seq("chain_no", "sale_dy"))

    // 5. dim overwrite-when-matched + IN-list fill.
    val dim = Tables.customer(spark, d)
      .select(col("c_custkey").as("chain_no"),
        when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("responsible_new"))
    val filled = inListNullFill(
      enrichJoinOverwrite(merged, dim, "chain_no", "responsible", "responsible_new"),
      "responsible", "chain_no", Seq(1L, 2L, 3L), "직영")

    // 6. atomic date-partitioned refresh, then serve the re-read.
    val sink = graft.ops.AppScratch.path(spark, "entry_mart")
    val mart = filled.withColumn("sale_month",
      date_format(col("sale_dy"), "yyyy-MM"))
    // co-partition by the partition column BEFORE the write (r21,
    // guide §6 — the q41 posture): without it every upstream task
    // writes a file into every month directory it holds rows for —
    // tasks×months small files at scale. One exchange buys one file
    // per partition dir; the served read-back is unchanged.
    mart.repartition(col("sale_month"))
      .write.partitionBy("sale_month").mode("overwrite").parquet(sink)
    // writer-schema read-back (r13 edge sweep): an empty slice writes
    // zero partition dirs and inference would throw instead of
    // serving an empty mart
    spark.read.schema(mart.schema).parquet(sink)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val tiers = Seq(
      RefQueries.queries, NorthQueries.queries, ExtQueries.queries,
      HardenQueries.queries, WidenQueries.queries,
      PipelineQueries.queries, DeepQueries.queries, CurateQueries.queries,
      ServeQueries.queries, OpsQueries.queries, MaintainQueries.queries)
    val merged = tiers.reduce(_ ++ _)
    // ++ silently keeps the LAST entry on a duplicate key: a reused
    // q-number across tiers would shrink the graded surface without
    // any signal — Verify's counts gate can't see it because
    // n_registered comes from this already-collapsed map (the r9
    // q95-vanished class, at the merge instead of the dump)
    require(merged.size == tiers.map(_.size).sum,
      "duplicate query key across tiers: " +
        tiers.flatMap(_.keys).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k
        }.mkString(", "))
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, LSH internals) → driver records rows-only.
    */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ NorthQueries.oracle ++ ExtQueries.oracle ++
      HardenQueries.oracle ++ WidenQueries.oracle ++
      PipelineQueries.oracle ++ DeepQueries.oracle ++ CurateQueries.oracle ++
      ServeQueries.oracle ++ OpsQueries.oracle ++ MaintainQueries.oracle
}
