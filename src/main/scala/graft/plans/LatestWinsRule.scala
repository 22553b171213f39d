package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite (SURVEY §4 stretch item, made real): turn the
  * `filter(row_number() over (partition by K order by O) === 1)`
  * latest-wins pattern (U1 / `RelationalOps.upsertLatestWins`) into a
  * `min_by(struct(*), struct(O))` aggregation.
  *
  * Why it matters at 100 TB: the aggregate form gets map-side partial
  * aggregation, so each map task ships at most one candidate row per
  * key. (Spark's own WindowGroupLimit optimization — present since
  * 3.5 — already achieves the same shuffle-volume bound for rank-1
  * filters, so the volume story is parity, not a win.) The remaining
  * win is the execution shape: the window form pays a full
  * (key ++ order-keys) sort, the group-limit machinery, the window
  * projection and the rank filter on both sides of the exchange; the
  * aggregate form is a plain agg — sorted only by the (shorter)
  * grouping key, or hash-aggregated outright when the row fits a
  * fixed-width buffer — and composes with every aggregate
  * optimization Catalyst knows.
  *
  * Semantics guardrails — the rule fires ONLY when the rewrite is
  * provably equivalent:
  *  - exactly one window expression, and it is `row_number()`;
  *  - the filter keeps exactly rank 1 (`rn = 1` / `1 = rn` / `rn <= 1`);
  *  - every ORDER BY key is ASCENDING, deterministic, and
  *    NON-NULLABLE (struct ordering and NULLS FIRST agree trivially
  *    when no nulls can occur — rather than reason about null
  *    placement, we refuse);
  *  - partition keys are plain attributes of the child.
  * Under a total order the two forms pick the same row; under ties
  * both forms pick an arbitrary tied row (row_number's sort is not
  * stable across retries either) — the operator's documented
  * determinism contract requires callers to pass a total order.
  *
  * The row_number column itself survives in the output as literal 1
  * (every surviving row had rn = 1 by construction), so downstream
  * references — typically just the `drop` projection — stay valid.
  */
class LatestWinsRule extends Rule[LogicalPlan] {

  private def keepsRankOne(cond: Expression, rn: ExprId): Boolean = cond match {
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) => a.exprId == rn
    case EqualTo(IntegerLiteral(1), a: AttributeReference) => a.exprId == rn
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(1)) => a.exprId == rn
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond, w: Window)
        if w.windowExpressions.size == 1 &&
          (w.windowExpressions.head match {
            case Alias(WindowExpression(_: RowNumber, _), _) => true
            case _ => false
          }) &&
          keepsRankOne(cond, w.windowExpressions.head.exprId) &&
          w.orderSpec.nonEmpty &&
          w.orderSpec.forall(s => s.direction == Ascending &&
            s.child.deterministic && !s.child.nullable) &&
          // a GLOBAL window (empty partitionSpec) must NOT rewrite: an
          // ungrouped aggregate emits one (all-null) row on empty
          // input where the window+filter form emits zero rows
          w.partitionSpec.nonEmpty &&
          w.partitionSpec.forall(_.isInstanceOf[AttributeReference]) &&
          w.partitionSpec.forall(p => w.child.outputSet.contains(
            p.asInstanceOf[AttributeReference])) =>
      val rnAlias = w.windowExpressions.head.asInstanceOf[Alias]
      val groupAttrs = w.partitionSpec.map(_.asInstanceOf[AttributeReference])
      val ordKeys = w.orderSpec.map(_.child)
      val ordExpr =
        if (ordKeys.size == 1) ordKeys.head else CreateStruct(ordKeys)
      // ONE shared AggregateExpression instance: every projected field
      // extracts from the same min_by, so physical planning computes
      // the aggregate once
      val minBy = AggregateExpression(
        MinBy(CreateStruct(w.child.output), ordExpr), Complete,
        isDistinct = false)
      val aggExprs: Seq[NamedExpression] =
        w.child.output.zipWithIndex.map { case (a, i) =>
          if (groupAttrs.exists(_.exprId == a.exprId)) a
          else Alias(GetStructField(minBy, i, Some(a.name)), a.name)(
            exprId = a.exprId)
        } :+ Alias(Literal(1), rnAlias.name)(exprId = rnAlias.exprId)
      Aggregate(groupAttrs, aggExprs, w.child)
  }
}
