package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / governance operators for corpus curation: deterministic
  * pseudonymization, partial masking, quasi-identifier generalization,
  * and a k-anonymity audit with suppression. A 100-TB training corpus
  * ships through exactly this pass before anything else reads it —
  * "remove direct identifiers, coarsen quasi-identifiers, prove the
  * coarsening is k-anonymous" is the standard release gate.
  *
  * Reference analog: none (the reference moves raw store/owner names
  * end to end, e.g. load_store_data.py:95-137 writes `dealer_nm`
  * verbatim); this tier is part of the engine-addition mandate.
  *
  * Design rules, same as the rest of the engine:
  *   - Deterministic: pseudonyms are keyed hashes (stable across runs,
  *     retries, and engines — re-runs produce the identical corpus; a
  *     salted-random pseudonym would break idempotent re-ingestion).
  *   - Codegen'd built-ins only (sha2/concat/substr/floor) — the
  *     masking pass is a pure projection, ZERO shuffles; the
  *     k-anonymity audit is one partial-agg shuffle over the class
  *     keys plus a broadcast join back.
  */
object PrivacyOps {

  /** Stable pseudonym: sha2-256 of the identifier plus a caller-owned
    * pepper. Same input + pepper → same 64-hex token on every engine
    * (lowercase hex on both Spark and DuckDB); without the pepper a
    * dictionary of known names would invert the hash trivially.
    */
  def pseudonym(id: Column, pepper: String): Column =
    sha2(concat(id, lit("|" + pepper)), 256)

  /** Partial mask: keep the first `keepPrefix` and last `keepSuffix`
    * characters, star the middle. Values too short to have a middle
    * are fully starred except the kept prefix (never negative repeat).
    */
  def maskMiddle(s: Column, keepPrefix: Int, keepSuffix: Int): Column = {
    val middle = greatest(length(s) - keepPrefix - keepSuffix, lit(0))
    concat(
      substring(s, 1, keepPrefix),
      repeat(lit("*"), middle.cast("int")),
      s.substr(length(s) - keepSuffix + 1, greatest(least(length(s) - keepPrefix, lit(keepSuffix)), lit(0))))
  }

  /** Quasi-identifier generalization: numeric value → band ordinal
    * (floor(v / width)). Banding, not rounding — bands tile the line
    * with no boundary double-counting, and the ordinal is integral so
    * the oracle compares exactly.
    */
  def band(v: Column, width: Double): Column =
    floor(v.cast("double") / lit(width))

  /** k-anonymity audit + suppression: given the quasi-identifier
    * columns, compute each equivalence class's size k, and suppress
    * (null out) the quasi-identifiers of every row whose class has
    * k < minK — the textbook release rule (a class smaller than k
    * re-identifies its members by intersection).
    *
    * Adds `k_class` (the class size BEFORE suppression — the audit
    * trail) and replaces each quasi-identifier with null where
    * suppressed. Scale shape: one partial-agg count over the class key
    * (tiny output — bounded by the number of classes, not rows) joined
    * back BROADCAST, so the corpus itself is scanned once and never
    * re-shuffled.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], minK: Long): DataFrame = {
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k_class"))
    // null-safe join keys: a null quasi-identifier is its own class
    // (groupBy already treats it so), and the join back must agree —
    // a plain equi-join would orphan those rows into k_class = null
    val right = classes.select(
      quasiCols.map(c => col(c).as(s"_k_$c")) :+ col("k_class"): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"_k_$c")).reduce(_ && _)
    val joined = df.join(broadcast(right), cond)
      .drop(quasiCols.map(c => s"_k_$c"): _*)
    quasiCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, when(col("k_class") >= minK, col(c)))
    }
  }
}
