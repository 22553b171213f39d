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
  *     k-anonymity audit is ONE window count over the class key (a
  *     single shuffle, no join — see kAnonymize's doc for why the
  *     older broadcast-join-back formulation was exactly backwards).
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
    * characters, star the middle.
    *
    * CONTRACT — the revealed set, not a starred fraction: the first
    * `keepPrefix` and last `keepSuffix` characters are treated as
    * public. A value with no middle (length ≤ keepPrefix+keepSuffix)
    * is therefore returned WHOLE, zero stars — deliberately (pinned in
    * PrivacyOpsSpec since the true-tail fix; the r14 review caught this
    * doc claiming "fully starred except the prefix", which the code
    * has never done). Callers choosing P/S must size them against the
    * SHORTEST value the column can carry; a guaranteed-minimum-stars
    * mask is a different operator.
    */
  def maskMiddle(s: Column, keepPrefix: Int, keepSuffix: Int): Column = {
    // negative keeps would silently corrupt the slice arithmetic
    // (empty prefix + inflated star count) — fail fast like band()
    require(keepPrefix >= 0 && keepSuffix >= 0,
      s"keepPrefix/keepSuffix must be >= 0, got ($keepPrefix, $keepSuffix)")
    val middle = greatest(length(s) - keepPrefix - keepSuffix, lit(0))
    // the suffix START must move with the CAPPED suffix length: with a
    // fixed start of length-keepSuffix+1, a value whose length falls
    // in (keepPrefix, keepPrefix+keepSuffix] took its capped slice
    // from inside the kept prefix — duplicating prefix characters and
    // dropping the true tail ("abc" masked (2,2) came out "abb")
    val sufLen =
      greatest(least(length(s) - keepPrefix, lit(keepSuffix)), lit(0))
    concat(
      substring(s, 1, keepPrefix),
      repeat(lit("*"), middle.cast("int")),
      s.substr(length(s) - sufLen + 1, sufLen))
  }

  /** Quasi-identifier generalization: numeric value → band ordinal
    * (floor(v / width)). Banding, not rounding — bands tile the line
    * with no boundary double-counting, and the ordinal is integral so
    * the oracle compares exactly.
    */
  def band(v: Column, width: Double): Column = {
    // width 0 would divide-by-zero into NULL bands — one giant NULL
    // equivalence class that trivially passes every k check
    require(width > 0, s"band width must be positive, got $width")
    // non-finite → NULL band, i.e. the same "unknown" equivalence
    // class as a NULL balance (r16 naninf probe): Spark's floor()
    // returns LONG, so floor(NaN) silently became band 0 — a
    // NaN-balance row joined the genuine band-0 class and the
    // k-anonymity audit counted it as a real member. The between test
    // is false for NaN (Spark orders NaN above MaxValue) and ±Inf.
    floor(graft.ops.RelationalOps.finiteOrNull(v.cast("double")) / lit(width))
  }

  /** k-anonymity audit + suppression: given the quasi-identifier
    * columns, compute each equivalence class's size k, and suppress
    * (null out) the quasi-identifiers of every row whose class has
    * k < minK — the textbook release rule (a class smaller than k
    * re-identifies its members by intersection).
    *
    * Adds `k_class` (the class size BEFORE suppression — the audit
    * trail) and replaces each quasi-identifier with null where
    * suppressed. Scale shape: ONE window count partitioned by the
    * class key — a single shuffle of the corpus, no second scan and no
    * join. (The previous broadcast-join-back formulation assumed the
    * class table is tiny, which is exactly backwards for the data a
    * k-audit exists for: near-unique quasi-identifiers make |classes|
    * ≈ |rows| and the forced broadcast dies at scale; it also scanned
    * the input twice. Window partitioning groups NULL quasi-values
    * together, same as groupBy.)
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], minK: Long): DataFrame = {
    // a release GATE must fail loudly on configs that void it: minK < 1
    // suppresses nothing by construction, an empty quasi set makes the
    // whole table one class (every row "passes"), and a pre-existing
    // k_class column would be silently overwritten — destroying a
    // prior audit's trail (r14 review; same fail-fast rule as band())
    require(minK >= 1, s"minK must be >= 1, got $minK")
    require(quasiCols.nonEmpty, "kAnonymize needs at least one quasi-identifier column")
    require(!df.columns.contains("k_class"),
      "input already carries a k_class column; rename it before re-auditing")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    val withK = df.withColumn("k_class", count(lit(1)).over(w))
    quasiCols.foldLeft(withK) { (acc, c) =>
      acc.withColumn(c, when(col("k_class") >= minK, col(c)))
    }
  }
}
