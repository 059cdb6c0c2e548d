package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: canonical text normalization for dedup
  * fingerprints and cross-source matching — trim, Unicode lower-case,
  * collapse runs of whitespace to one space, and strip diacritics
  * (NFD decomposition, drop combining marks: é→e, ü→u, ñ→n).
  *
  * The same canonical form DuckDB spells
  * `strip_accents(lower(trim(regexp_replace(s, '\s+', ' ', 'g'))))` —
  * the oracle for q80. The steps commute (case/accent mapping never
  * produces or consumes whitespace), so one pass ordering is fine.
  *
  * Codegen emits a single static call per row — the per-row work is
  * string-heavy (regex + NFD), so unlike the bit-loop expressions
  * there is nothing to gain from inlining the body into generated
  * Java; the point of the native expression is staying inside
  * whole-stage codegen with no UDF serialization boundary.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Static row kernel, called from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val collapsed = s.toString.trim
      .toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
    val nfd = java.text.Normalizer.normalize(collapsed,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
