package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators for training-data
  * pipelines. Every decision is a pure function of the row's key — no
  * `rand()` anywhere — so re-runs, retries, speculative tasks, and
  * backfills land every row in the same split or sample. That
  * reproducibility is non-negotiable for a 100-TB corpus: a train/test
  * split that drifts between runs silently leaks eval data into
  * training. Spark's own `randomSplit`/`sample` re-draw per run (and
  * per task retry unless the seed AND partitioning are frozen), which
  * is exactly the trap these operators exist to avoid.
  *
  * The hash is multiplicative (Knuth): bucket(key) takes the HIGH bits
  * of `key * 2654435761 mod 2^32` — plain 64-bit integer arithmetic,
  * no engine-specific hash function, so the assignment is portable to
  * any SQL dialect and the DuckDB oracle recomputes it exactly.
  * Everything here is a narrow projection/filter: zero shuffles, fully
  * codegen'd, embarrassingly parallel at any scale.
  *
  * Reference analog: none (the reference has no sampling tier); this
  * is part of the mandated LLM-pipeline surface (SURVEY.md §2h).
  */
object SampleOps {

  /** floor(2^32 / golden ratio) — Knuth's multiplicative constant. */
  private val Phi = 2654435761L
  private val M32 = 4294967296L // 2^32
  private val M31 = 2147483648L // 2^31 — key domain after the fold

  /** Deterministic bucket in [0, buckets): multiplicative hash using
    * the product's high bits within the 32-bit window (low bits of a
    * multiplicative hash are weakly mixed; the high-bit slice is the
    * textbook formulation). The key first folds into [0, 2^31) with a
    * positive mod, so ANY long key is safe: without the fold, keys
    * ≥ ~3.47e9 overflow `key * Phi` past 2^63 and wrap NEGATIVE,
    * which would silently dump every such row into the first split —
    * the exact leak this operator exists to prevent. A NULL key
    * yields a NULL bucket (and a null split / dropped sample row
    * downstream) — callers must key on a non-null id.
    */
  def bucket(key: Column, buckets: Int): Column =
    // ... * buckets / 2^32, with the division as a SHIFT: Column./ is
    // double division in Spark, and this must stay exact 64-bit
    // integer arithmetic end to end
    shiftright((pmod(key.cast("long"), lit(M31)) * Phi % M32) *
      buckets.toLong, 32)

  /** Assign each row to a named split by cumulative percentage, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)` (must sum to
    * 100). Adds `splitCol` with the split name. One codegen'd
    * projection — the 100-TB cost is a scan, nothing else.
    */
  def hashSplit(df: DataFrame, keyCol: String, splitCol: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(col(keyCol), 100)
    val cuts = splits.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    val expr0 = splits.zip(cuts).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cut)) =>
        when(b < cut && acc.isNull, lit(name)).otherwise(acc)
    }
    // scanLeft gives ascending cuts; the first `b < cut` that fires is
    // the right band because later whens keep the earlier non-null
    df.withColumn(splitCol, expr0)
  }

  /** Deterministic per-stratum sampling: keep a row iff
    * bucket(key, 100) < pct(stratum). `rates` maps stratum value →
    * keep percentage; strata not listed use `defaultPct`. This is the
    * corpus-rebalancing primitive (e.g. keep 30% of English, 10% of
    * everything else) — a pure filter, no shuffle, and the same row
    * set on every run and every engine.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), 100) < pct)
  }
}
