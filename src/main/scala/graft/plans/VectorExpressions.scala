package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot loop (SURVEY.md §2h
  * stretch goal; registered via [[GraftExtensions]]).
  *
  * Why custom expressions here and nowhere else: every other operator
  * in the engine is expressible with codegen'd built-ins, but the
  * higher-order-function formulation of a dot product
  * (`aggregate(zip_with(a,b,*),0,+)`) evaluates its lambda
  * INTERPRETED, once per element, allocating as it goes — on the
  * quadratic stage of a similarity join that is the hot loop. These
  * expressions generate a tight primitive `for` over the two
  * `ArrayData` buffers inside whole-stage codegen (and cosine fuses
  * dot + both norms into ONE pass). Array-level null handling is
  * inherited from BinaryExpression (null in → null out); element nulls
  * are not expected in embedding vectors (parquet `list<float>` from
  * the fixture is non-null) and read as 0.0, exactly as the HOF path's
  * `x.cast("double")` would propagate them.
  */
abstract class VectorFold extends BinaryExpression with Serializable {
  // Input typing: the registry builder (GraftExtensions) wraps both
  // children in Cast(_, array<double>) — no-op casts are optimized
  // away, float arrays widen in one codegen'd pass, and anything
  // uncastable fails analysis with a standard cast error.
  override def dataType: DataType = DoubleType
}

/** dot(a, b) = Σ aᵢ·bᵢ over min(|a|,|b|) elements, one codegen'd pass. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot/(|a|·|b|), dot and BOTH norms fused into a single
  * pass (the HOF formulation folds the arrays three times). 0-norm
  * input yields NaN, same as the HOF division.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
