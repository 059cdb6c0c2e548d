package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-exact numeric helpers.
  *
  * The driver hash-compares our results against a DuckDB oracle, so
  * aggregate values must be bit-identical, not just "close". Plain
  * `sum(double)` is accumulation-order-dependent (Spark's partial
  * aggregation and DuckDB's hash agg sum in different orders), so any
  * double aggregation is routed through an exact DECIMAL accumulator:
  * the double is rounded to a fixed scale (deterministic, identical in
  * both engines), summed exactly, and the exact total cast back to
  * double (IEEE round-to-nearest — also identical). Scalar double
  * arithmetic (`a*b`, `1-x`) is already deterministic IEEE and needs
  * no help.
  *
  * At scale this costs nothing: Spark decimal sums of precision<=38
  * use long/Decimal128 arithmetic inside whole-stage codegen and keep
  * map-side partial aggregation.
  */
object Exact {
  /** Enough headroom for 100-TB-scale sums of price-like values. */
  val Dec: DecimalType = DecimalType(28, 6)

  /** Exact sum of a double-valued column; returns double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact-sum-based average of a double-valued column; returns double. */
  def davg(c: Column): Column =
    (sum(c.cast(Dec)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** DuckDB-side rendering of [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE)"

  /** DuckDB-side rendering of [[davg]]. */
  def sqlAvg(expr: String): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE) / COUNT($expr))"
}
