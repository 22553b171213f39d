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

  override def apply(ext: SparkSessionExtensions): Unit = {
    // sort-free latest-wins: row_number=1 upserts → min_by aggregates
    // (map-side partial agg slashes the upsert's shuffle volume)
    ext.injectOptimizerRule(_ => new LatestWinsRule)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot",
        "graft_dot(a, b) - dot product of two double arrays"),
      (children: Seq[Expression]) => DotProduct(asVec(children(0)), asVec(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info(classOf[CosineSimilarity], "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two double arrays"),
      (children: Seq[Expression]) => CosineSimilarity(asVec(children(0)), asVec(children(1)))))
  }
}
