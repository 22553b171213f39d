package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (test scope, not part of the library):
  * `sbt "Test/runMain graft.DevProfile"` — times the similarity-join
  * stages separately so optimization targets the real cost.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docsWithNearDups = {
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      docs.unionByName(docs.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text")))
    }
    // localCheckpoint like the real q29/q37 call sites — the profiler
    // must measure the shipped plan shape, not a strawman that
    // recomputes the shingle pipeline per consumer
    lazy val sh = docsWithNearDups.select(col("doc_id"),
      TextOps.ngramHashes64(TextOps.tokens(col("text")), 3).as("sh"))
      .localCheckpoint()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }

    // warm-up
    Tables.documents(spark, sfDir).count()
    sh.count()

    time("sh (ngram hashes)")(sh.count())
    val cands = TextOps.prefixFilterCandidates(sh, "doc_id", "sh", 4, 5)
    time("prefix candidates")(cands.count())
    val nCands = cands.count()
    var nTrue = 0L
    time("verify (full q37)") {
      nTrue = TextOps.jaccardVerify(cands, sh, "doc_id", "sh", 4, 5).count()
      nTrue
    }
    println(f"[q37] candidates=$nCands true_pairs=$nTrue " +
      f"overgeneration=${nCands.toDouble / math.max(1L, nTrue)}%.2fx " +
      "(round-4 baseline: 175,420 for 6,002 = 29.2x)")
    val sig = TextOps.minhashSignatures(sh, "doc_id", "sh", 32)
    time("minhash signatures")(sig.count())
    val lshCands = TextOps.lshCandidates(
      TextOps.lshBands(sig, "doc_id", "sig", 16, 2), "doc_id",
      maxBucket = 64)
    time("lsh candidates")(lshCands.count())
    time("verify (full q29)")(
      TextOps.jaccardVerify(lshCands, sh, "doc_id", "sh", 4, 5).count())
    // q56 breakdown: pair generation (the q37 machinery) vs the CC loop
    val pairs = TextOps.jaccardVerify(cands, sh, "doc_id", "sh", 4, 5)
      .select("id_a", "id_b")
    time("q56 pair gen (cold)")(pairs.count())
    time("q56 cc loop")(
      graft.ops.GraphOps.connectedComponents(pairs).count())
    // q66 profiling formulations: one-pass Expand multi-distinct vs
    // per-column two-phase hash aggs (4 scans, each pruned to 1 column)
    locally {
      val o = Tables.orders(spark, sfDir).select(col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
      time("q66 profileColumns")(
        graft.ops.RelationalOps.profileColumns(o, cols).count())
      // the inlined per-column formulation profileColumns now ships
      // (kept as the measured round-6 A/B reference: the one-pass
      // Expand multi-distinct it replaced measured 2.92s vs 0.40s)
      time("q66 per-column union")(
        cols.map { c =>
          o.groupBy(col(c)).agg(count(lit(1)).as("_cnt"))
            .agg(count(lit(1)).as("n_distinct"),
              sum(when(col(c).isNull, col("_cnt")).otherwise(lit(0L))).as("n_null"),
              min(col(c)).cast("string").as("min_val"),
              max(col(c)).cast("string").as("max_val"))
            .select(lit(c).as("col_name"), col("n_null"), col("n_distinct"),
              col("min_val"), col("max_val"))
        }.reduce(_ unionByName _).count())
    }
    // per-round anatomy of the CC loop
    locally {
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
        .localCheckpoint()
      var labels = edges.select(col("u").as("doc_id")).distinct()
        .withColumn("component", col("doc_id")).localCheckpoint()
      var i = 0
      var done = false
      while (!done && i < 20) {
        val t0 = System.nanoTime()
        val msgs = edges.join(labels.select(col("doc_id").as("v"),
            col("component").as("_vc")), "v")
          .select(col("u").as("doc_id"), col("_vc").as("_cand"),
            lit(null).cast("long").as("_own"))
        val self = labels.select(col("doc_id"),
          col("component").as("_cand"), col("component").as("_own"))
        val updated = msgs.unionByName(self).groupBy(col("doc_id"))
          .agg(min(col("_cand")).as("component"), min(col("_own")).as("_old"))
          .localCheckpoint()
        val t1 = System.nanoTime()
        val changed = updated.filter(col("component") =!= col("_old")).count()
        labels = updated.drop("_old")
        done = changed == 0
        i += 1
        println(f"[cc] round $i: checkpoint=${(t1 - t0) / 1e9}%5.2fs " +
          f"count=${(System.nanoTime() - t1) / 1e9}%5.2fs changed=$changed")
      }
    }
    spark.stop()
  }
}
