package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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
  * dot + both norms into ONE pass). Null semantics MATCH the HOF
  * forms exactly (r12): a null array yields null (BinaryExpression);
  * a LENGTH MISMATCH yields null (zip_with pads the shorter side with
  * null, which nulls the HOF fold) — a truncated partial sum would be
  * a plausible-looking wrong number on a ragged embedding; and a null
  * ELEMENT yields null for the same reason. The per-element null
  * check is one branch the JIT hoists when the array's containsNull
  * is false.
  */
abstract class VectorFold extends BinaryExpression with ExpectsInputTypes
    with Serializable {
  // Input typing, both routes (r14 review): the registry builder
  // (GraftExtensions) wraps both children in Cast(_, array<double>) —
  // no-op casts are optimized away, float arrays widen in one
  // codegen'd pass, and anything uncastable fails analysis with a
  // standard cast error. A DIRECTLY-constructed DotProduct(e1, e2)
  // over non-array children used to pass analysis (dataType is
  // hardcoded) and die at runtime in codegen/eval; ExpectsInputTypes
  // turns that into the clean analysis-time type error.
  // inferred return type: AbstractDataType is private[sql], unnameable
  // from here; Seq[ArrayType] conforms to the override
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  // These folds return null for NON-null inputs (length mismatch, null
  // element), so nullability cannot be derived from the children the way
  // BinaryExpression does: with non-nullable children (literal probe
  // vectors, array(...) constructors) the inherited nullable=false makes
  // nullSafeCodeGen emit `false = true;` for our `${ev.isNull} = true`
  // branches (codegen compile failure → silent interpreted fallback),
  // and the optimizer then folds IsNull to false over an expression
  // that CAN be null — UnsafeProjection skips the null bit and
  // downstream reads garbage. Always-nullable is the only sound answer.
  override def nullable: Boolean = true
}

/** dot(a, b) = Σ aᵢ·bᵢ, one codegen'd pass; null on length mismatch
  * or any null element (the HOF forms' semantics, see class doc). */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
      s
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot/(|a|·|b|), dot and BOTH norms fused into a single
  * pass (the HOF formulation folds the arrays three times). 0-norm
  * input yields NaN — Java division here, a guarded CaseWhen in the
  * HOF form (`VectorOps.cosine`), because under ANSI mode a raw SQL
  * double division would THROW instead (r14 review); null on length
  * mismatch or any null element (the HOF forms' semantics, class doc).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = x.getDouble(i)
        val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
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
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
