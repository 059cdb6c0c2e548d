package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks that compile to ONE aggregate pass.
  *
  * The reference's pipeline trusts whatever the generator drops
  * (`check_lakehouse.py` records load success/failure but never
  * inspects rows); a production lakehouse gates commits on content.
  * These checks are the gate predicates for the write-audit-publish
  * flow ([[VersionedTable.commitAudited]], the loader's `audit`
  * hook): each check contributes aggregate columns to a single
  * `df.agg(...)` job — at 100 TB the audit costs one scan with
  * map-side partials, never one job per rule — and the result is a
  * list of human-readable violation strings (empty = publish).
  */
object DataQuality {

  sealed trait Check
  /** Any listed column null ⇒ the row violates. */
  final case class NotNull(cols: Seq[String]) extends Check
  /** The listed column tuple must be unique across the batch. */
  final case class Unique(cols: Seq[String]) extends Check
  /** Non-null values must fall in [lo, hi]. */
  final case class InRange(col: String, lo: Any, hi: Any) extends Check
  /** Non-null values must be one of `values`. */
  final case class InSet(col: String, values: Seq[Any]) extends Check
  /** The batch must carry at least `n` rows (an empty or truncated
    * drop is usually an upstream failure, not a real batch). */
  final case class MinRows(n: Long) extends Check
  /** At most `frac` of the column may be null. */
  final case class MaxNullFraction(col: String, frac: Double) extends Check

  /** Evaluate every check in one aggregate job; returns one message
    * per violated check (empty = clean). Uniqueness rides the same
    * aggregate via `count(*) − countDistinct(struct)`. */
  def violations(df: DataFrame, checks: Seq[Check]): Seq[String] = {
    if (checks.isEmpty) return Nil
    val aggs = scala.collection.mutable.Buffer[Column](
      count(lit(1)).as("_total"))
    checks.zipWithIndex.foreach { case (chk, i) =>
      val c = chk match {
        case NotNull(cols) =>
          sum(when(cols.map(col(_).isNull).reduce(_ || _), 1L)
            .otherwise(0L))
        case Unique(cols) =>
          count(lit(1)) - countDistinct(struct(cols.map(col): _*))
        case InRange(cc, lo, hi) =>
          sum(when(col(cc).isNotNull &&
            (col(cc) < lit(lo) || col(cc) > lit(hi)), 1L).otherwise(0L))
        case InSet(cc, values) =>
          sum(when(col(cc).isNotNull &&
            !col(cc).isin(values: _*), 1L).otherwise(0L))
        case MinRows(_) => count(lit(1))
        case MaxNullFraction(cc, _) =>
          sum(when(col(cc).isNull, 1L).otherwise(0L))
      }
      aggs += c.as(s"_c$i")
    }
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*).head()
    val total = row.getLong(0)
    checks.zipWithIndex.flatMap { case (chk, i) =>
      val v = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      chk match {
        case NotNull(cols) if v > 0 =>
          Some(s"not_null(${cols.mkString(",")}): $v row(s) with nulls")
        case Unique(cols) if v > 0 =>
          Some(s"unique(${cols.mkString(",")}): $v duplicate row(s)")
        case InRange(c, lo, hi) if v > 0 =>
          Some(s"in_range($c, $lo, $hi): $v row(s) out of range")
        case InSet(c, _) if v > 0 =>
          Some(s"in_set($c): $v row(s) outside the accepted set")
        case MinRows(n) if v < n =>
          Some(s"min_rows($n): batch has only $v row(s)")
        case MaxNullFraction(c, f) if total > 0 && v.toDouble / total > f =>
          Some(f"max_null_fraction($c, $f): ${v.toDouble / total}%.4f null")
        case _ => None
      }
    }
  }
}
