package graft

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r21 dev harness: stage anatomy of q37's prefixFilterCandidates —
  * which internal stage carries the cost, and does broadcasting the
  * (candidates × prefix-token) probe side of the exact-overlap
  * refinement beat shuffling the full inverted index?
  * The body replicates TextOps.prefixFilterCandidates stage by stage
  * (dev-only duplication, measurement purpose).
  */
object DevPrefixStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = if (args.length > 0) args(0).toInt else 5
    val (num, den) = (4, 5)
    val idCol = "doc_id"

    val docs = Tables.documents(spark, sfDir)
      .groupBy(col("doc_id")).agg(max(col("text")).as("text"))
    val corpus = docs.unionByName(
      docs.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text")))
    val sh = graft.ops.Materialize.once("dev.sh",
      corpus.select(col("doc_id"),
        TextOps.ngramHashes64(TextOps.tokens(col("text")), 3).as("sh")))

    // ---- replicate prefixFilterCandidates internals
    val idx = sh.select(col(idCol), size(col("sh")).as("_sz"),
      explode(col("sh")).as("_tok"))
    val dfreq = broadcast(idx.groupBy(col("_tok")).agg(count(lit(1)).as("_df")))
    val ranked = idx.join(dfreq, "_tok")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("_df"), col("_tok"))))
    val probeLen = col("_sz") - floor((col("_sz") * num + den - 1) / den) + 1
    val indexLen = col("_sz") - floor((col("_sz") * 2 * num + (num + den - 1)) / (num + den)) + 1
    val pref = graft.ops.Materialize.once("dev.prefixIndex", ranked
      .filter(col("_rn") <= probeLen)
      .select(col(idCol), col("_tok"), col("_sz"), col("_rn"),
        (col("_rn") <= indexLen).as("_inIdx")))
    def matched = pref
      .select(col(idCol).as("id_a"), col("_tok"),
        col("_sz").as("_sza"), col("_rn").as("_pa"))
      .join(pref.filter(col("_inIdx"))
        .select(col(idCol).as("id_b"), col("_tok"),
          col("_sz").as("_szb"), col("_rn").as("_pb")), Seq("_tok"))
      .filter(struct(col("_szb"), col("id_b")) < struct(col("_sza"), col("id_a"))
        && col("_szb") * den >= col("_sza") * num
        && col("_sza") * den >= col("_szb") * num)
    val minov = floor(
      ((col("_sza") + col("_szb")) * num + (num + den - 1)) / (num + den))
    def pairBound = matched
      .filter(least(col("_pa"), col("_pb"))
        + least(col("_sza") - col("_pa"), col("_szb") - col("_pb")) >= minov)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("_k"),
        max(col("_pa")).as("_pamax"), max(col("_pb")).as("_pbmax"),
        max(col("_sza")).as("_sza"), max(col("_szb")).as("_szb"))
      .filter(col("_k")
        + least(col("_sza") - col("_pamax"), col("_szb") - col("_pbmax"))
        >= minov)
      .select("id_a", "id_b", "_sza", "_szb")
    val prefA = pref.select(col(idCol).as("id_a"), col("_tok"))
    val idxB = idx.select(col(idCol).as("id_b"), col("_tok"))
    val probeLenA = col("_sza") - floor((col("_sza") * num + den - 1) / den) + 1
    def refinedShuffle = pairBound.join(prefA, "id_a")
      .join(idxB, Seq("id_b", "_tok"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("_kf"),
        max(col("_sza")).as("_sza"), max(col("_szb")).as("_szb"))
      .filter(col("_kf") + (col("_sza") - probeLenA) >= minov)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    def refinedBcast = broadcast(pairBound.join(prefA, "id_a"))
      .join(idxB, Seq("id_b", "_tok"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("_kf"),
        max(col("_sza")).as("_sza"), max(col("_szb")).as("_szb"))
      .filter(col("_kf") + (col("_sza") - probeLenA) >= minov)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))

    // ---- lshCandidates stage split
    val sig = TextOps.minhashSignatures(sh, idCol, "sh", 32)
    def bandsDf = TextOps.lshBands(sig, idCol, "sig", 16, 2)

    def arm(label: String)(f: => Long): (String, () => Double) =
      label -> (() => {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      })
    val arms = Seq(
      arm("matched")(matched.count()),
      arm("pairBound")(pairBound.count()),
      arm("refined_shuffle")(refinedShuffle.count()),
      arm("refined_bcast")(refinedBcast.count()),
      arm("minhash_sig")(sig.count()),
      arm("lsh_bands")(bandsDf.count()),
      arm("lsh_cands")(TextOps.lshCandidates(bandsDf, idCol, 64).count()),
      arm("lsh_cands_nomat")({
        // lshCandidates without the Materialize.once: re-run the (now
        // codegen'd) minhash+banding pipeline per consumer instead of
        // checkpointing it
        val banded = bandsDf
        val hot = banded.groupBy(col("band_idx"), col("band_sig"))
          .agg(count(lit(1)).as("_bn")).filter(col("_bn") > 64)
          .select(col("band_idx"), col("band_sig"))
        val capped = banded.join(broadcast(hot),
          Seq("band_idx", "band_sig"), "left_anti")
        val a = capped.select(col("band_idx"), col("band_sig"),
          col(idCol).as("id_a"))
        val b = capped.select(col("band_idx"), col("band_sig"),
          col(idCol).as("id_b"))
        a.join(b.hint("shuffle_hash"), Seq("band_idx", "band_sig"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().count()
      })
    )
    // sanity: both refinement forms agree
    println("refined rows shuffle=" + refinedShuffle.count() +
      " bcast=" + refinedBcast.count())
    arms.foreach { case (_, f) => f() } // warm-up
    val acc = scala.collection.mutable.LinkedHashMap(
      arms.map { case (l, _) => l -> List.empty[Double] }: _*)
    (1 to reps).foreach { _ =>
      arms.foreach { case (l, f) => acc(l) = f() :: acc(l) }
    }
    acc.foreach { case (l, xs) =>
      println(f"$l%-16s min=${xs.min}%6.3f med=${xs.sorted.apply(xs.size / 2)}%6.3f max=${xs.max}%6.3f")
    }
    spark.stop()
  }
}
