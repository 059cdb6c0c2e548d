package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen random-hyperplane LSH signature: bit `p` of the
  * result = sign of `dot(vec, h_{base+p})`, where hyperplane
  * `h_j[k] = ±1` is derived from `xxhash64(j, k)`'s low bit — the
  * standard sign-random-projection sketch (Charikar 2002), seeded
  * identically to the builtin `xxhash64(int, int)` fold
  * (`hashInt(k, hashInt(j, 42))`), so signatures are bit-equal to the
  * previous `aggregate(zip_with(...))` SQL formulation.
  *
  * That HOF formulation is interpreted per element — planes×dims
  * lambda dispatches per ROW (32×64 = 2048 for the near-dup bands).
  * Here the whole signature is one generated primitive loop inside
  * whole-stage codegen.
  */
case class HyperplaneBits(child: Expression, base: Int, planes: Int)
  extends UnaryExpression {

  require(planes >= 1 && planes <= 64, s"planes must be in [1,64], got $planes")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bits requires array<float|double>, got ${other.catalogString}")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bits = 0L
    var p = 0
    while (p < planes) {
      val seedP = XXH64.hashInt(base + p, 42L)
      var dot = 0.0
      var k = 0
      while (k < n) {
        if (!arr.isNullAt(k)) {
          val h = if ((XXH64.hashInt(k, seedP) & 1L) == 1L) 1.0 else -1.0
          val x = if (isFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
          dot += x * h
        }
        k += 1
      }
      if (dot > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val getX = if (isFloat) s"(double) $arr.getFloat" else s"$arr.getDouble"
      val n = ctx.freshName("n")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val seedP = ctx.freshName("seedP")
      val dot = ctx.freshName("dot")
      val h = ctx.freshName("h")
      s"""
         |int $n = $arr.numElements();
         |long $bits = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $seedP = $xxh.hashInt($base + $p, 42L);
         |  double $dot = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    if (!$arr.isNullAt($k)) {
         |      double $h = (($xxh.hashInt($k, $seedP) & 1L) == 1L) ? 1.0 : -1.0;
         |      $dot += $getX($k) * $h;
         |    }
         |  }
         |  if ($dot > 0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}
