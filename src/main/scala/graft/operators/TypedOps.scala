package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed Dataset surface: case-class rows + a custom typed
  * `Aggregator` — the API tier to use when compile-time safety
  * matters more than dynamic schemas. The aggregator is mergeable
  * (map-side partial aggregation works exactly like the untyped
  * hash aggregate) and keeps an exact BigDecimal accumulator, so its
  * results hash-match the same DuckDB oracle as the untyped path. */
object TypedOps {

  type QFn = (SparkSession, String) => DataFrame

  case class OrderRow(o_orderstatus: String, o_totalprice: Double)

  case class PriceStats(n: Long, total: BigDecimal)

  /** Exact (count, decimal total) aggregator over order prices. */
  object PriceAgg extends Aggregator[OrderRow, PriceStats, (Long, Double)] {
    private val Scale = 6
    override def zero: PriceStats = PriceStats(0L, BigDecimal(0).setScale(Scale))
    override def reduce(b: PriceStats, a: OrderRow): PriceStats =
      PriceStats(b.n + 1,
        b.total + BigDecimal(a.o_totalprice).setScale(Scale, BigDecimal.RoundingMode.HALF_UP))
    override def merge(x: PriceStats, y: PriceStats): PriceStats =
      PriceStats(x.n + y.n, x.total + y.total)
    override def finish(r: PriceStats): (Long, Double) = (r.n, r.total.toDouble)
    override def bufferEncoder: Encoder[PriceStats] = Encoders.product[PriceStats]
    override def outputEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
  }

  /** Per-status order stats through the typed API; output identical
    * to the untyped decimal-exact aggregation. */
  private val q58: QFn = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .as[OrderRow]
      .groupByKey(_.o_orderstatus)
      .agg(PriceAgg.toColumn.name("stats"))
      .select(col("key").as("o_orderstatus"),
        col("stats._1").as("n_orders"),
        col("stats._2").as("total_price"))
  }
  private val q58Sql =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    AS total_price
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  val queries: Map[String, QFn] = Map("q58_typed_agg" -> q58)
  val oracleSql: Map[String, String] = Map("q58_typed_agg" -> q58Sql)
}
