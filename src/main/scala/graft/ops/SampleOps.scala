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

  /** The bucket arithmetic restated in portable SQL (default salt 0)
    * — the oracle twin pinned NEXT to the Scala implementation so the
    * two can only drift together. Both query-tier oracle maps use
    * this one definition (they used to carry verbatim private
    * copies). `//` is DuckDB integer division.
    */
  def bucketSql(key: String): String =
    // `key` is parenthesized before the %: a compound expression
    // argument ("a + b") would otherwise bind as a + (b % …) — a
    // silently different hash from bucket(col("a") + col("b"), …)
    // (r14 review; current callers pass bare identifiers)
    s"(((((($key) % 2147483648) + 2147483648) % 2147483648) * 2654435761) " +
      "% 4294967296) * 100 // 4294967296"

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
    * downstream) — callers must key on a non-null INTEGRAL id
    * (hashSplit/stratifiedSample enforce the type; a string key would
    * cast to NULL and silently drop the whole corpus).
    *
    * `salt`: XOR-mixed into the folded key BEFORE the multiply, so
    * different salts give genuinely decorrelated assignments (an
    * additive salt would only rotate the hash space — every row of a
    * sampled slice would land in the SAME split band). Two decisions
    * on the same key MUST use different salts: sample-then-split with
    * the same salt keeps exactly the rows whose bucket is below both
    * cuts — e.g. a 10% sample split 80/10/10 lands entirely in
    * "train". Default 0 preserves the committed oracle assignments.
    */
  def bucket(key: Column, buckets: Int, salt: Long = 0L): Column =
    // ... * buckets / 2^32, with the division as a SHIFT: Column./ is
    // double division in Spark, and this must stay exact 64-bit
    // integer arithmetic end to end
    shiftright((pmod(key.cast("long"), lit(M31))
      .bitwiseXOR(lit(salt & (M31 - 1))) * Phi % M32) *
      buckets.toLong, 32)

  /** Fail fast on a non-integral key: `cast("long")` on a string id
    * yields NULL for every row — the corpus would silently vanish
    * from a sample / get NULL splits instead of erroring. */
  private def requireIntegralKey(df: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"key column '$keyCol' must be integral for the portable " +
        s"multiplicative hash, got ${dt.simpleString}; hash string ids " +
        "to a long first (e.g. xxhash64) and accept engine-specific " +
        "oracle arithmetic, or join to an integral surrogate key")
  }

  /** Assign each row to a named split by cumulative percentage, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)` (must sum to
    * 100). Adds `splitCol` with the split name. One codegen'd
    * projection — the 100-TB cost is a scan, nothing else.
    */
  def hashSplit(df: DataFrame, keyCol: String, splitCol: String,
                splits: Seq[(String, Int)],
                salt: Long = 0L): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    requireIntegralKey(df, keyCol)
    val b = bucket(col(keyCol), 100, salt)
    val cuts = splits.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    // ascending cuts ⇒ a plain when-CHAIN is correct (first match
    // wins) and linear in expression size — the old fold referenced
    // the accumulator twice per split, doubling the tree each step
    val expr0 = splits.zip(cuts).tail
      .foldLeft(when(b < cuts.head, lit(splits.head._1))) {
        case (acc, ((name, _), cut)) => acc.when(b < cut, lit(name))
      }
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
                       rates: Map[String, Int], defaultPct: Int,
                       salt: Long = 0L): DataFrame = {
    requireIntegralKey(df, keyCol)
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), 100, salt) < pct)
  }
}
