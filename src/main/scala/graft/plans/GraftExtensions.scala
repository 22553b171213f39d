package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Engine extension point, wired the idiomatic Spark way: sessions add
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * and the native vector expressions become SQL- and
  * `call_function`-addressable (`SELECT graft_cosine(a.v, b.v) …`).
  * Injection happens per-session at build time — no global registry
  * mutation, cluster-safe.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "",
      "", "", "", "", "", "built-in")

  private def asVec(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  // arity check at resolution time (r14 review): children(i) alone
  // silently DROPPED extra arguments (graft_dot(a, b, c) returned
  // dot(a, b) — a plausible wrong answer through the SQL front door)
  // and threw a raw IndexOutOfBounds on too few, instead of the
  // analysis error every built-in raises
  private def binary(name: String, mk: (Expression, Expression) => Expression)
      (children: Seq[Expression]): Expression = {
    if (children.size != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> "2",
          "actualNum" -> children.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    mk(asVec(children(0)), asVec(children(1)))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // sort-free latest-wins: row_number=1 upserts → min_by aggregates
    // (map-side partial agg slashes the upsert's shuffle volume)
    ext.injectOptimizerRule(_ => new LatestWinsRule)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot",
        "graft_dot(a, b) - dot product of two double arrays"),
      binary("graft_dot", DotProduct.apply)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info(classOf[CosineSimilarity], "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two double arrays"),
      binary("graft_cosine", CosineSimilarity.apply)))
  }
}
