package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev harness (r21): interleaved same-JVM A/B of scan-rebalance
  * strategies for the single-row-group fixture bottleneck. Variants of
  * the same computation run round-robin within one session so ambient
  * drift hits all arms equally; minima over reps are compared.
  *
  * Usage: Test/runMain graft.DevRebalanceAB [reps] [sfDir]
  */
object DevRebalanceAB {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 7
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val P = spark.sparkContext.defaultParallelism

    def li = Tables.lineitem(spark, sfDir)
    def docs = Tables.documents(spark, sfDir)

    // --- shape 1: q17-style store×day agg over lineitem
    def aggOf(src: DataFrame): DataFrame = src
      .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("sale_dy"))
      .agg(count(lit(1)).as("bill_qty"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("total_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("amt"))
    // --- shape 2: q23-style supp×part revenue agg (many groups)
    def revOf(src: DataFrame): DataFrame = {
      val price = col("l_extendedprice").cast(DecimalType(18, 2))
      val disc = col("l_discount").cast(DecimalType(18, 2))
      src.groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum((price * (lit(1).cast(DecimalType(18, 2)) - disc))
          .cast(DecimalType(18, 4))).as("_rev"))
    }
    // --- shape 3: q88-style shingle hash + explode + broadcast probe
    def shOf(src: DataFrame): DataFrame = {
      val sh = src.select(col("doc_id"),
        graft.ops.TextOps.ngramHashes64(
          graft.ops.TextOps.tokens(col("text")), 3).as("_sh"))
      val ev = sh.filter(col("doc_id") % 97 === 0)
        .select(explode(col("_sh")).as("_h")).distinct()
      sh.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("_sh")).as("_h"))
        .join(broadcast(ev), "_h").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
    }

    // --- shape 4: q58-style broadcast interval probe (BNLJ) over facts
    def rangeOf(src: DataFrame): DataFrame = {
      val periods = spark.range(0, 28).toDF("period_id")
        .withColumn("p_start",
          date_add(to_date(lit("1995-01-01")), (col("period_id") * 90).cast("int")))
        .withColumn("p_end",
          date_add(to_date(lit("1995-01-01")), (col("period_id") * 90 + 180).cast("int")))
      graft.ops.TemporalOps.rangeJoinBroadcast(
        src.select(col("l_shipdate"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("_rev")),
        periods, "l_shipdate", "p_start", "p_end")
        .groupBy(col("period_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("_rev").cast("decimal(18,4)")).cast("double").as("revenue"))
    }
    // --- shape 5: q50-style token materialize + simhash 64-vote agg
    def simhashOf(src: DataFrame): DataFrame = {
      val d2 = src.filter(col("text").isNotNull)
      val corpus = d2.select(col("doc_id"), col("text")).unionByName(
        d2.select((col("doc_id") + 100000L).as("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
      val toks = corpus.select(col("doc_id"),
        graft.ops.TextOps.tokens(col("text")).as("_toks"))
      // agg over the fingerprint so count() cannot prune the 64 votes
      graft.ops.TextOps.simhashSignatures(toks, "doc_id", "_toks", "_h")
        .agg(sum(col("_h")).as("s"), count(lit(1)).as("n"))
    }
    // --- shape 6: q85-style explode+distinct+groupBy
    def invOf(src: DataFrame): DataFrame =
      src.filter(col("lang") === "en")
        .select(col("doc_id"),
          explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "").distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("n_docs"))

    // --- shape 7: q38-style envelope assembly — where does the
    // per-row JSON extract + concat run: in the (single-task) scan
    // stage before the window exchange, or post-exchange in parallel
    // (shipping the wider raw props through the exchange instead)?
    def envOf(postExchange: Boolean): DataFrame = {
      val ev = Tables.events(spark, sfDir)
      def rec = concat(lit("{\"id\":"), col("event_id").cast("string"),
        lit(",\"k\":"),
        coalesce(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
          .cast("string"), lit("null")),
        lit("}")).as("rec")
      val base =
        if (postExchange) ev.select(col("user_id"), col("event_id"), col("props"))
        else ev.select(col("user_id"), col("event_id"), rec)
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      val bucketed = base
        .withColumn("_bkt", floor((row_number().over(wb) - 1) / lit(500)))
      val withRec = if (postExchange) bucketed.select(col("user_id"),
        col("_bkt"), rec) else bucketed
      withRec.groupBy(col("user_id"), col("_bkt"))
        .agg(concat_ws(",", collect_list(col("rec"))).as("_recs"))
        .select(length(col("_recs")).as("l"))
        .agg(sum(col("l")))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "env_pre" -> (() => envOf(false)),
      "env_post" -> (() => envOf(true)),
      "agg_plain" -> (() => aggOf(li)),
      "agg_groupkey" -> (() => aggOf(li.repartition(P, col("l_suppkey"),
        col("l_shipdate").cast("date")))),
      "rev_plain" -> (() => revOf(li)),
      "range_plain" -> (() => rangeOf(li)),
      "range_rr" -> (() => rangeOf(li.repartition(P))),
      "range_hashkey" -> (() => rangeOf(li.repartition(P, col("l_orderkey")))),
      "simhash_plain" -> (() => simhashOf(docs)),
      "simhash_rr" -> (() => simhashOf(docs.repartition(P))),
      "simhash_hash" -> (() => simhashOf(docs.repartition(P, col("doc_id")))),
      "inv_plain" -> (() => invOf(docs)),
      "inv_hashkey" -> (() => invOf(docs.repartition(P, col("doc_id")))),
      "sh_plain" -> (() => shOf(docs)),
      "sh_rr" -> (() => shOf(docs.repartition(P))),
      "sh_hashkey" -> (() => shOf(docs.repartition(P, col("doc_id"))))
    )

    // warm-up every arm once
    variants.foreach { case (_, f) => f().count() }
    val acc = scala.collection.mutable.LinkedHashMap(
      variants.map { case (n, _) => n -> List.empty[Double] }: _*)
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().count()
        acc(n) = ((System.nanoTime() - t0) / 1e9) :: acc(n)
      }
    }
    acc.foreach { case (n, xs) =>
      println(f"$n%-14s min=${xs.min}%6.3f med=${xs.sorted.apply(xs.size / 2)}%6.3f max=${xs.max}%6.3f")
    }
    spark.stop()
  }
}
