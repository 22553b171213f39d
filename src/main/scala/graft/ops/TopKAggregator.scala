package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §7's optional `Aggregator[IN,BUF,OUT]`,
  * made real): bounded top-k per group as an AGGREGATE, not a window.
  *
  * Why this exists beside q23's window/WindowGroupLimit top-k: an
  * aggregator's buffer is the k-element list itself, so the partial
  * aggregation ships at most k rows per group per map task and the
  * merge is k-list merge — no per-partition sort of the full input,
  * and the result is available inside any groupBy alongside other
  * aggregates (a window can't mix with aggregation in one pass).
  * Trade: object buffers run on ObjectHashAggregate (no whole-stage
  * codegen), so for plain "top-k then nothing else" the built-in
  * WindowGroupLimit path stays competitive — PlanSpec pins q23 to
  * that; q71 grades this path against the SAME oracle.
  *
  * Determinism: ranking order is total — value DESC then tiebreak ASC
  * — so merges are associative/commutative up to the k-cutoff and the
  * result is partitioning-independent.
  */
object TopKAggregator {

  /** (value, tiebreak) ranking entry. The value is a primitive double
    * — NOT a re-introduction of float drift: no accumulation happens
    * here (the caller sums in DECIMAL upstream; this aggregator only
    * RANKS the finished sums), and decimal(p,4)→double is injective,
    * hence order-preserving, whenever |v|·10⁴ < 2⁵³ (the caller's
    * contract; TPC-H-shaped group revenues sit ~9 orders below it).
    * Primitive entries keep the per-row encoder on the flat
    * tuple fast path — the BigDecimal variant paid a Catalyst
    * Decimal→java.math.BigDecimal→scala.BigDecimal round trip per
    * input row, which round-6 measured as the bulk of q71's 2.2s gap
    * over the window formulation on identical input.
    */
  type Entry = (Double, Long)

  final class TopK(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0, "k must be positive")

    // a ranks strictly before b: larger value, then smaller tiebreak.
    // Total for non-NaN doubles; NaN entries are dropped at reduce —
    // NaN compares false both ways, which would break merge
    // commutativity and make the top-k partitioning-dependent
    private def before(a: Entry, b: Entry): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] =
      if (buf.size >= k && before(buf.last, e)) buf // below the cut
      else {
        val (hi, lo) = buf.span(before(_, e))
        ((hi :+ e) ++ lo).take(k)
      }

    override def zero: Seq[Entry] = Nil
    override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] =
      if (e._1.isNaN) buf else insert(buf, e)
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
  }
}
