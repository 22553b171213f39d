package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout operators: the write-side choices that decide how
  * much of a 100-TB table a query must READ. q67 covers the
  * one-dimensional case (range-partition + sort → row-group min/max
  * stats prune a date band). This module adds the multi-dimensional
  * one: Z-ORDER (Morton) clustering, where bit-interleaving two key
  * columns gives a single sort key under which row groups stay narrow
  * in BOTH dimensions — so a scan filtered on either key (or both)
  * skips most files on parquet footer stats alone. The same trick
  * Delta/Iceberg OPTIMIZE ZORDER applies, done with plain Spark
  * writes and integer arithmetic.
  *
  * Reference analog: none — the reference's MySQL marts lean on B-tree
  * PKs (kicc_to_tb_sales.py:61-66); columnar layouts move that
  * locality decision to write time.
  */
object LayoutOps {

  /** Morton (Z-order) code: interleave the low `bits` bits of x and y
    * (x in even positions, y in odd). Pure codegen'd integer
    * arithmetic — 2·bits shift/mask terms OR-folded; no UDF, no
    * lookup tables, portable to any engine. Keys are first folded into
    * [0, 2^bits) with a positive mod, so any long input is safe
    * (negative keys would otherwise smear across the whole curve).
    *
    * bits ≤ 16 keeps the result within 32 bits — more than enough
    * resolution for layout: the curve only has to order ROW GROUPS
    * (~10^5 per table), not distinguish every row.
    */
  def mortonCode(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = pmod(x.cast("long"), lit(1L << bits))
    val ys = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }
}
