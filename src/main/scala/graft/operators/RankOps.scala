package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global ranking WITHOUT a single-reducer window.
  *
  * `Window.orderBy(...)` with no partition spec sends every row to
  * one task — the classic 100-TB serialization point. The scalable
  * equivalent: range-repartition on the sort key (partitions carry
  * disjoint, ordered key ranges), sort within each partition, then
  * `zipWithIndex` — Spark's two-pass global index: one job counts
  * rows per partition, the offsets are broadcast, and a second pass
  * adds the partition offset to each local index. Only the
  * numPartitions-sized count array ever reaches the driver, and no
  * task sees more than its partition.
  */
object RankOps {

  /** Append a 1-based global rank in `sortCols` order. `sortCols`
    * must be a total order (add a unique tiebreak) for the rank to be
    * deterministic. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      partitions: Int, rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** SQL NTILE(k) bucket from a 1-based global rank over n rows:
    * the first n mod k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋.
    * Matches NTILE in Spark and DuckDB. (The double divisions are
    * exact here: an exactly-divisible integer quotient divides to
    * the exact integer double, and a non-integer true quotient sits
    * ≥ 1/divisor away from the next integer — far beyond an ulp —
    * so the truncating cast equals integer division.) */
  def ntileFromRank(rank: Column, n: Long, k: Int): Column = {
    require(k > 0 && n >= 0)
    val q = n / k
    val rem = n % k
    val big = lit(rem * (q + 1)) // rows living in the ⌈n/k⌉-sized buckets
    val qBig = lit((q + 1).toDouble)
    val qSmall = lit((if (q == 0) 1 else q).toDouble)
    when(rank <= big, ((rank - 1) / qBig).cast("long") + 1)
      .otherwise(lit(rem) + ((rank - 1 - big) / qSmall).cast("long") + 1)
      .cast("int")
  }
}
