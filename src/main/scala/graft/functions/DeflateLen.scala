package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DEFLATE-compressed byte length of a
  * string/binary column — the compression-ratio quality signal LLM
  * data pipelines use to catch machine-generated boilerplate and
  * low-entropy spam (compressed/raw ≪ 1 ⇒ highly repetitive text;
  * ≈ 1 ⇒ high-entropy noise; natural prose sits in between). The
  * in-row twin of q77's duplicate-shingle fractions: DEFLATE's LZ77
  * window catches repetition structures (long-range phrase reuse,
  * periodic templates) that fixed-width shingle counting misses.
  *
  * Pure per-row kernel ⇒ map-only at any scale, and a fixed
  * deflater configuration (level 6, default strategy, raw zlib
  * stream) makes the value deterministic for a given input on a
  * given JDK/zlib build. Not SQL-expressible in the oracle engine —
  * q84 is a rows-only query; the spec pins the semantics (monotone
  * under repetition, stability, null/empty edges).
  *
  * Codegen emits one static call per row: the work is the deflater
  * itself, so the value of the native expression is staying inside
  * whole-stage codegen with no UDF serialization boundary (same
  * rationale as [[NormalizeText]]).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_len requires string or binary, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => DeflateLen.deflateLen(s.getBytes)
    case b: Array[Byte] => DeflateLen.deflateLen(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev,
        c => s"graft.functions.DeflateLen.deflateLen($c.getBytes())")
      case _ => defineCodeGen(ctx, ev,
        c => s"graft.functions.DeflateLen.deflateLen($c)")
    }

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** Static row kernel, called from generated code. One deflater per
    * call: Deflater is stateful and not thread-safe, and codegen rows
    * are evaluated concurrently across tasks — `reset()`-pooling would
    * need thread-locals for a ~µs/KB kernel. ends() deterministic
    * output: fixed level/strategy, single setInput+finish cycle. */
  def deflateLen(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6, /*nowrap=*/ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
