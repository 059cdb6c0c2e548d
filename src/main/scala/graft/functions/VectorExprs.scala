package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dense-vector kernels.
  *
  * The same math written with `aggregate`/`zip_with` higher-order
  * functions runs INTERPRETED — a per-element lambda dispatch that
  * measures ~100× slower than generated Java (see SURVEY §4). These
  * expressions are the ANN/similarity hot path: a plain primitive
  * loop inside whole-stage codegen, no boxing, no lambda, no driver
  * materialization of the vectors (contrast with collecting a
  * broadcast matrix: here the arrays stay in their rows and the loop
  * runs where the row is).
  *
  * Accumulation is in index order, so results are deterministic for
  * a given pair of arrays (double addition is order-dependent across
  * DIFFERENT orders, but the generated loop has one fixed order —
  * and it matches the `aggregate(zip_with(...))` fold order, so
  * swapping the HOFs for these expressions is value-identical).
  */
trait VectorBinaryExpr extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left.dataType), elemOf(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  /** Interpreted element read as double (null element → 0 vote). */
  protected def elem(arr: ArrayData, i: Int, side: Expression): Double =
    if (arr.isNullAt(i)) 0.0
    else side.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  /** Generated element read as double. */
  protected def elemJava(arr: String, i: String, side: Expression): String =
    side.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
}

/** `dot_product(a, b)` = Σ a(i)·b(i) over min(len) elements, one
  * generated loop. The primitive every ANN path builds on. */
case class DotProduct(left: Expression, right: Expression)
  extends VectorBinaryExpr {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) dot += elem(x, i, left) * elem(y, i, right)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $dot += ${elemJava(a, i, left)} * ${elemJava(b, i, right)};
         |  }
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `cosine_sim(a, b)` = dot(a,b) / (‖a‖·‖b‖) — dot and BOTH norms in
  * a single generated pass (vs three dot_product calls = three array
  * traversals). Value-identical to
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` because each of the
  * three accumulators sums in the same index order. */
case class CosineSim(left: Expression, right: Expression)
  extends VectorBinaryExpr {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xa = elem(x, i, left)
        val yb = elem(y, i, right)
        dot += xa * yb
        na += xa * xa
        nb += yb * yb
      }
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $xa = ${elemJava(a, i, left)};
         |    double $yb = ${elemJava(b, i, right)};
         |    $dot += $xa * $yb; $na += $xa * $xa; $nb += $yb * $yb;
         |  }
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
