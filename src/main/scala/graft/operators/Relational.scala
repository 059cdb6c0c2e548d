package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Checkpoints.CutOps
import graft.util.Exact._

/** Relational analytics surface — the Spark-native equivalent of the
  * reference's ad-hoc lakehouse query capability
  * (`lib/commondb.py:85-125`, `execute_pd_query`), expressed as
  * declarative DataFrame plans so Catalyst handles pushdown, pruning,
  * join selection and AQE handles runtime re-planning.
  *
  * Scale notes (100 TB):
  *  - dimension tables (region/nation/supplier/part/customer) stay
  *    broadcast-side; fact-fact joins shuffle on join keys.
  *  - every aggregate is a plain hash aggregate with map-side partial
  *    aggregation; no driver-side collection anywhere.
  *  - top-k uses orderBy+limit which Spark plans as
  *    TakeOrderedAndProject (per-partition partial top-k, no full sort).
  */
object Relational {

  type QFn = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: single-pass grouped aggregation over the fact
    * table with arithmetic measures. */
  private val q01: QFn = (s, d) => {
    val l = Tables.lineitem(s, d)
    l.filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }
  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 shape: highly selective scan-side filter; verifies
    * predicate pushdown reaches the parquet scan. */
  private val q02: QFn = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }
  private val q02Sql =
    s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q3 shape: dim⋈fact⋈fact with broadcastable customer side,
    * grouped revenue, deterministic top-k (tiebreak on key). */
  private val q03: QFn = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }
  private val q03Sql =
    s"""SELECT l_orderkey,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       |  o_orderpriority
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1996-06-30'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey ASC
       |LIMIT 10""".stripMargin

  /** TPC-H Q4 shape: EXISTS → left-semi join (no row duplication,
    * no distinct needed). */
  private val q04: QFn = (s, d) => {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }
  private val q04Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q5 shape: star join across all dimensions; every dim side
    * is broadcast, the only shuffle is the final aggregation. */
  private val q05: QFn = (s, d) => {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }
  private val q05Sql =
    s"""SELECT n_name,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name""".stripMargin

  /** Window ranking: top-5 customers by lifetime spend within each
    * nation. row_number with a unique tiebreak keeps it deterministic. */
  private val q06: QFn = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("spend"))
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val w = Window.partitionBy("n_name").orderBy(col("spend").desc, col("c_custkey").asc)
    spend.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("n_name", "rnk", "c_custkey", "c_name", "spend")
  }
  private val q06Sql =
    s"""SELECT n_name, rnk, c_custkey, c_name, spend FROM (
       |  SELECT n_name, c_custkey, c_name, spend,
       |    ROW_NUMBER() OVER (PARTITION BY n_name
       |                       ORDER BY spend DESC, c_custkey ASC) AS rnk
       |  FROM (SELECT o_custkey, ${sqlSum("o_totalprice")} AS spend
       |        FROM orders GROUP BY o_custkey) s
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |) t WHERE rnk <= 5""".stripMargin

  /** Running total over a time series: exact decimal accumulation all
    * the way through the window sum (cast to double only at the end).
    * The unpartitioned window is scale-safe here: its input is the
    * per-DAY aggregate — date-dimension-sized (thousands of rows at
    * any data scale), not fact-sized. For ranking over fact-sized
    * input see RankOps / q63. */
  private val q07: QFn = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("o_totalprice").cast(Dec)).as("rev_dec"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_rev", sum(col("rev_dec")).over(w).cast("double"))
      .select(col("day"), col("rev_dec").cast("double").as("day_rev"), col("running_rev"))
  }
  private val q07Sql =
    """SELECT day, CAST(rev_dec AS DOUBLE) AS day_rev,
      |  CAST(SUM(rev_dec) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_rev
      |FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
      |        SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev_dec
      |      FROM orders GROUP BY 1) t""".stripMargin

  /** COUNT(DISTINCT) per group (exact; at 100 TB the approx_ variant
    * in ScaleOps is the right tool — this is the exact reference). */
  private val q08: QFn = (s, d) => {
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }
  private val q08Sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  /** Top-k by aggregated measure (TakeOrderedAndProject — partial
    * top-k per partition, no global sort materialization). */
  private val q09: QFn = (s, d) => {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "p_name", "p_brand")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        dsum(col("l_quantity")).as("qty"))
      .orderBy(col("revenue").desc, col("p_partkey").asc)
      .limit(10)
  }
  private val q09Sql =
    s"""SELECT p_partkey, p_name, p_brand,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  ${sqlSum("l_quantity")} AS qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_partkey, p_name, p_brand
       |ORDER BY revenue DESC, p_partkey ASC
       |LIMIT 10""".stripMargin

  /** Aggregate filter (HAVING). */
  private val q10: QFn = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_bal"))
      .filter(col("n_customers") >= 50)
  }
  private val q10Sql =
    s"""SELECT n_name, COUNT(*) AS n_customers,
       |  ${sqlSum("c_acctbal")} AS total_bal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name HAVING COUNT(*) >= 50""".stripMargin

  /** TPC-H Q12 shape: conditional aggregation (CASE inside SUM). */
  private val q11: QFn = (s, d) => {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val o = Tables.orders(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
  }
  private val q11Sql =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus""".stripMargin

  /** ROLLUP grouping sets (nulls coalesced to 'ALL' so both engines
    * emit an identical, null-free result). */
  private val q12: QFn = (s, d) => {
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
  }
  private val q12Sql =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
       |FROM orders
       |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** Set operations: INTERSECT + EXCEPT composition. */
  private val q13: QFn = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val active96 = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey").as("custkey"))
    val negative = c.filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    building.intersect(active96).except(negative)
  }
  private val q13Sql =
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1996
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal < 0""".stripMargin

  /** Scalar-subquery shape: rows above 1.2× the group average
    * (exact-decimal average so the threshold is engine-identical). */
  private val q14: QFn = (s, d) => {
    val p = Tables.part(s, d)
    val avgByType = p.groupBy(col("p_type").as("t"))
      .agg(davg(col("p_retailprice")).as("avg_price"))
    p.join(broadcast(avgByType), col("p_type") === col("t"))
      .filter(col("p_retailprice") > col("avg_price") * 1.03)
      .select("p_partkey", "p_name", "p_type", "p_retailprice")
  }
  private val q14Sql =
    s"""SELECT p_partkey, p_name, p_type, p_retailprice
       |FROM part p
       |JOIN (SELECT p_type AS t, ${sqlAvg("p_retailprice")} AS avg_price
       |      FROM part GROUP BY p_type) a ON p.p_type = a.t
       |WHERE p_retailprice > avg_price * 1.03""".stripMargin

  /** Anti-join (NOT EXISTS): customers who never placed a large
    * order. Filter applied below the join so the anti-join probe side
    * shrinks before the shuffle. */
  private val q15: QFn = (s, d) => {
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
    c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }
  private val q15Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_totalprice > 450000)""".stripMargin

  /** Exact interpolated percentiles per group (rounded to 6 dp to
    * absorb last-ulp interpolation differences between engines). */
  private val q16: QFn = (s, d) => {
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
        round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"))
  }
  private val q16Sql =
    """SELECT o_orderstatus,
      |  ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
      |  ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Pivot: order counts, status × priority matrix. */
  private val q17: QFn = (s, d) => {
    val pri = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val safe = Seq("urgent", "high", "medium", "not_specified", "low")
    val piv = Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", pri)
      .agg(count(lit(1)))
    pri.zip(safe).foldLeft(piv) { case (df, (p, a)) =>
      df.withColumn(a, coalesce(col(s"`$p`"), lit(0L))).drop(p)
    }
  }
  private val q17Sql =
    """SELECT o_orderstatus,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Monthly revenue time series (date_trunc shape). */
  private val q18: QFn = (s, d) => {
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
  }
  private val q18Sql =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |  ${sqlSum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
       |FROM orders GROUP BY 1""".stripMargin

  /** Reference-domain analog (datagen.py survey analytics): outcome
    * rate per category — share of events with value above threshold. */
  private val q19: QFn = (s, d) => {
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") > 5.0, 1L).otherwise(0L)).as("n_high"),
        (sum(when(col("value") > 5.0, 1L).otherwise(0L)).cast("double") / count(lit(1))).as("high_rate"))
  }
  private val q19Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN value > 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |  CAST(SUM(CASE WHEN value > 5.0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |    AS high_rate
      |FROM events GROUP BY event_type""".stripMargin

  /** Bucketed histogram (maps the reference's departure_delay
    * distribution analysis, datagen.py:27). */
  private val q20: QFn = (s, d) => {
    Tables.events(s, d)
      .groupBy(floor(col("value") / 5.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
  }
  private val q20Sql =
    """SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS bucket,
      |  COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v
      |FROM events GROUP BY 1""".stripMargin

  /** TPC-H Q17 shape — correlated scalar subquery: revenue from
    * small-quantity lineitems, where "small" is relative to each
    * part's own average quantity. De-correlated into an aggregate +
    * broadcast join, which is how it should run at 100 TB: one pass
    * to build the per-part thresholds (small — one row per part),
    * broadcast, one pass over the fact table. */
  private val q25: QFn = (s, d) => {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val avgQty = l.groupBy(col("l_partkey").as("pk"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    l.join(broadcast(avgQty), col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(dsum(col("l_extendedprice")).as("small_qty_revenue"),
        count(lit(1)).as("n_lines"))
  }
  private val q25Sql =
    s"""SELECT p_brand,
       |  ${sqlSum("l_extendedprice")} AS small_qty_revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |JOIN (SELECT l_partkey AS pk, ${sqlAvg("l_quantity")} AS avg_qty
       |      FROM lineitem GROUP BY l_partkey) a ON l_partkey = pk
       |JOIN part ON l_partkey = p_partkey
       |WHERE l_quantity < avg_qty * 0.5
       |GROUP BY p_brand""".stripMargin

  /** CUBE grouping sets over two dimensions (all four grouping
    * combinations in ONE Expand + one shuffle; nulls coalesced so both
    * engines emit identical rows). Expressed through `spark.sql` —
    * the DataFrame `cube()` API trips Spark's ambiguous-self-join
    * detector when the cube input is a join (the cube Expand
    * duplicates join-tagged attributes); the SQL path builds the
    * identical plan without the dataset-id tags. */
  private val q26: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("g26_customer")
    Tables.nation(s, d).createOrReplaceTempView("g26_nation")
    s.sql(s"""
      SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
        COALESCE(n_name, 'ALL') AS nation,
        COUNT(*) AS n_customers,
        ${sqlSum("c_acctbal")} AS total_bal
      FROM g26_customer JOIN g26_nation ON c_nationkey = n_nationkey
      GROUP BY CUBE (c_mktsegment, n_name)""")
  }
  private val q26Sql =
    s"""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
       |  COALESCE(n_name, 'ALL') AS nation,
       |  COUNT(*) AS n_customers, ${sqlSum("c_acctbal")} AS total_bal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY CUBE (c_mktsegment, n_name)""".stripMargin

  /** FULL OUTER join of two daily series — order intake vs shipment
    * activity; days present in only one side survive with zero-filled
    * measures. Both sides pre-aggregate to one row per day before the
    * join, so the outer join shuffles day-level rows, not facts. */
  private val q27: QFn = (s, d) => {
    val ordered = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 2001)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_ordered"))
    val shipped = Tables.lineitem(s, d)
      .filter(year(col("l_shipdate")) === 2001)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_shipped"))
    ordered.join(shipped, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_ordered"), lit(0L)).as("n_ordered"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
  }
  private val q27Sql =
    """SELECT COALESCE(o.day, s.day) AS day,
      |  COALESCE(n_ordered, 0) AS n_ordered,
      |  COALESCE(n_shipped, 0) AS n_shipped
      |FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, COUNT(*) AS n_ordered
      |      FROM orders WHERE date_part('year', o_orderdate) = 2001 GROUP BY 1) o
      |FULL OUTER JOIN
      |     (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, COUNT(*) AS n_shipped
      |      FROM lineitem WHERE date_part('year', l_shipdate) = 2001 GROUP BY 1) s
      |ON o.day = s.day""".stripMargin

  /** Sliding-window smoothing: 7-day moving average + day-over-day
    * delta (lag) on daily revenue. Decimal end-to-end inside the
    * window frame; cast to double only on output. */
  private val q28: QFn = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("o_totalprice").cast(Dec)).as("rev_dec"))
    val wMa = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    val wLag = Window.orderBy("day")
    daily
      .withColumn("ma7",
        sum(col("rev_dec")).over(wMa).cast("double") / count(lit(1)).over(wMa))
      .withColumn("delta",
        (col("rev_dec") - coalesce(lag(col("rev_dec"), 1).over(wLag),
          col("rev_dec"))).cast("double"))
      .select(col("day"), col("rev_dec").cast("double").as("day_rev"),
        col("ma7"), col("delta"))
  }
  private val q28Sql =
    """SELECT day, CAST(rev_dec AS DOUBLE) AS day_rev,
      |  CAST(SUM(rev_dec) OVER w7 AS DOUBLE) / COUNT(*) OVER w7 AS ma7,
      |  CAST(rev_dec - COALESCE(LAG(rev_dec, 1) OVER (ORDER BY day), rev_dec)
      |       AS DOUBLE) AS delta
      |FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
      |        SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev_dec
      |      FROM orders GROUP BY 1) t
      |WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Decile segmentation: ntile(10) over account balance (unique
    * tiebreak → deterministic assignment), per-decile stats.
    *
    * GLOBAL-WINDOW AUDIT (r14): this is the ONE deliberately
    * data-scaled `Window.orderBy` in the query surface — the declared
    * NAIVE baseline whose scalable twin q63 (RankOps global ranks,
    * spec-pinned output-equal, same oracle) is the shape production
    * paths use. Every other partition-less window site is provably
    * bounded (calendar/decile/top-k/delay grain; see
    * OPTIMIZATION_r14.md §window audit). */
  private val q29: QFn = (s, d) => {
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .withColumn("decile", ntile(10).over(w))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        dsum(col("c_acctbal")).as("total_bal"))
  }
  private val q29Sql =
    s"""SELECT decile, COUNT(*) AS n, MIN(c_acctbal) AS min_bal,
       |  MAX(c_acctbal) AS max_bal, ${sqlSum("c_acctbal")} AS total_bal
       |FROM (SELECT c_acctbal,
       |        NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
       |      FROM customer) t
       |GROUP BY decile""".stripMargin

  /** q29's deciles through the SCALABLE exact-ranking path: a bare
    * `ntile() OVER (ORDER BY ...)` sends every row to one reducer —
    * fine until the table is a 100 TB fact. RankOps range-repartitions
    * on the sort key and assigns exact global ranks with two
    * distributed passes (only a partition-count array reaches the
    * driver), then the NTILE bucket is pure arithmetic on the rank.
    * Output is identical to q29 (total sort order + exact NTILE
    * semantics) → shares its oracle; the spec pins equality. */
  private val q63: QFn = (s, d) => {
    val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
    val n = c.count()
    RankOps.withGlobalRank(c,
        Seq(col("c_acctbal").asc, col("c_custkey").asc),
        rankCol = "rk") // partitions follow spark.sql.shuffle.partitions
      .withColumn("decile", RankOps.ntileFromRank(col("rk"), n, 10))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        dsum(col("c_acctbal")).as("total_bal"))
  }

  /** q16's exact interpolated percentiles WITHOUT the per-group
    * `percentile()` buffer: Spark's exact percentile aggregate holds
    * every group's values in ONE task's memory — fine for 3 order
    * statuses at sf0.1, an OOM at a 10-TB group. The scalable form is
    * the q29→q63 move applied to quantiles: a 0-based in-group rank
    * from [[RankOps.withGroupedPrefixSum]] (value ≡ 1 ⇒ exclusive
    * count ⇒ rank; two passes, driver sees a partitions×groups list),
    * group counts, then each requested percentile becomes TWO probe
    * ranks (floor/ceil of h = (n−1)·p) — a broadcast equi-join picks
    * those ≤ 2·|groups|·|ps| rows and linear interpolation
    * `v_lo + (v_hi − v_lo)·frac` reproduces the aggregate's exact
    * double arithmetic. Identical output → shares q16's oracle;
    * equality is also spec-pinned. */
  private val q85: QFn = (s, d) => {
    val base = Tables.orders(s, d)
      .select(col("o_orderstatus"),
        col("o_totalprice").cast("double").as("v"), col("o_orderkey"))
      .filter(col("v").isNotNull)
    val ps = Seq(0.25, 0.5, 0.75, 0.9)
    groupedPercentiles(base, "o_orderstatus", "v", Seq("o_orderkey"), ps)
      .withColumn("pv", round(col("pv"), 6))
      .groupBy(col("g"))
      .pivot("p", ps)
      .agg(first(col("pv")))
      .select(col("g").as("o_orderstatus"), col("`0.25`").as("p25"),
        col("`0.5`").as("p50"), col("`0.75`").as("p75"),
        col("`0.9`").as("p90"))
  }

  /** Moved to [[RankOps.groupedPercentiles]] (round 9) — kept as a
    * local alias so the q85/q104 call sites read the same. */
  private def groupedPercentiles(df: org.apache.spark.sql.DataFrame,
      groupCol: String, valueCol: String, tieCols: Seq[String],
      ps: Seq[Double]): org.apache.spark.sql.DataFrame =
    RankOps.groupedPercentiles(df, groupCol, valueCol, tieCols, ps)

  /** q15's anti-join with the Bloom pre-filter (JoinOps.bloomAntiJoin):
    * bloom-negative customers skip the join, only the sketch-positive
    * minority shuffles. Identical output → shares q15's oracle. */
  private val q56: QFn = (s, d) => {
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
      .select("o_custkey")
    JoinOps.bloomAntiJoin(c, big, "c_custkey", "o_custkey")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** String-function surface: regex extraction, case folding, length
    * arithmetic — grouped by the extracted token. */
  private val q55: QFn = (s, d) => {
    val color = regexp_extract(col("p_name"), "^(\\w+)", 1)
    val noun = regexp_extract(col("p_name"), "(\\w+)$", 1)
    Tables.part(s, d)
      .select(upper(color).as("color"), noun.as("noun"), col("p_name"))
      .groupBy("color")
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("noun")).as("n_nouns"),
        min(length(col("p_name"))).as("min_name_len"),
        max(length(col("p_name"))).as("max_name_len"))
  }
  private val q55Sql =
    """SELECT upper(regexp_extract(p_name, '^(\w+)', 1)) AS color,
      |  COUNT(*) AS n_parts,
      |  COUNT(DISTINCT regexp_extract(p_name, '(\w+)$', 1)) AS n_nouns,
      |  MIN(length(p_name)) AS min_name_len,
      |  MAX(length(p_name)) AS max_name_len
      |FROM part GROUP BY 1""".stripMargin

  /** Date arithmetic surface: datediff between the fact tables' two
    * date columns, grouped by order year. */
  private val q57: QFn = (s, d) => {
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n_lines"),
        davg(datediff(col("l_shipdate"), col("o_orderdate")).cast("double"))
          .as("avg_ship_days"),
        max(datediff(col("l_shipdate"), col("o_orderdate"))).as("max_ship_days"))
  }
  private val q57Sql =
    s"""SELECT date_part('year', o_orderdate) AS order_year,
       |  COUNT(*) AS n_lines,
       |  ${sqlAvg("CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE)")}
       |    AS avg_ship_days,
       |  MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_ship_days
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1""".stripMargin

  /** Explicit GROUPING SETS (arbitrary set list — not derivable from
    * ROLLUP/CUBE): per-(status), per-(priority), and grand total in
    * one Expand + one shuffle, with grouping() flags distinguishing
    * real nulls from set placeholders. */
  private val q60: QFn = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("g60_orders")
    s.sql(s"""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        GROUPING(o_orderstatus) AS g_status,
        GROUPING(o_orderpriority) AS g_priority,
        COUNT(*) AS n_orders,
        ${sqlSum("o_totalprice")} AS revenue
      FROM g60_orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
  }
  private val q60Sql =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  GROUPING(o_orderstatus) AS g_status,
       |  GROUPING(o_orderpriority) AS g_priority,
       |  COUNT(*) AS n_orders,
       |  ${sqlSum("o_totalprice")} AS revenue
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** TPC-H Q21 shape (adapted: lateness = shipped >90 days after
    * order date; the testdata carries no receipt/commit dates): for
    * each supplier, count 'F'-status orders where it was late, the
    * order had OTHER suppliers (EXISTS → left-semi), and none of the
    * others were late (NOT EXISTS → left-anti). Catalyst plans the
    * two correlated subqueries as semi/anti joins against the same
    * fact — no subquery re-execution per row — and the dim joins
    * broadcast. Top-10 via TakeOrderedAndProject. */
  private val q70: QFn = (s, d) => {
    val late = datediff(col("l_shipdate"), col("o_orderdate")) > 90
    // "late line on an F order" is needed TWICE — as the driving set
    // and as the NOT-EXISTS probe (lateOthers is the SAME relation,
    // renamed) — so it is built once and cached, instead of scanning
    // lineitem+orders again for the subquery side
    val l1 = graft.util.DfCache.getOrBuild(s, s"late70:$d") {
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val r = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey")
        .cache()
      r.count()
      r
    }
    val others = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey"))
    val withOthers = l1.join(others,
      col("l_orderkey") === col("x_orderkey") &&
        col("l_suppkey") =!= col("x_suppkey"), "left_semi")
    val lateOthers = l1.select(col("l_orderkey").as("x_orderkey"),
      col("l_suppkey").as("x_suppkey"))
    val sole = withOthers.join(lateOthers,
      col("l_orderkey") === col("x_orderkey") &&
        col("l_suppkey") =!= col("x_suppkey"), "left_anti")
    sole.join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(10)
  }
  private val q70Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE date_diff('day', o_orderdate, l1.l_shipdate) > 90
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND date_diff('day', o_orderdate, l3.l_shipdate) > 90)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q22 shape (adapted: segment instead of the absent phone
    * country code, and "no HIGH-VALUE order" instead of "no order" —
    * the dense test data gives every rich customer some order):
    * customers with above-average positive balance and no order over
    * 300k — the scalar subquery broadcasts as a 1-row cross join, the
    * NOT EXISTS plans as a left-anti join with its filter pushed
    * below, and the exact decimal average makes the > threshold
    * engine-identical. */
  private val q71: QFn = (s, d) => {
    val c = Tables.customer(s, d)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal")).as("ab"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000)
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
  }
  private val q71Sql =
    s"""SELECT c_mktsegment, COUNT(*) AS numcust,
       |  ${sqlSum("c_acctbal")} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (
       |    SELECT ${sqlAvg("c_acctbal")} FROM customer WHERE c_acctbal > 0)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey AND o_totalprice > 300000)
       |GROUP BY c_mktsegment""".stripMargin

  /** TPC-H Q15 shape: quarterly revenue per supplier, keep the
    * supplier(s) achieving the MAX — a scalar subquery over an
    * aggregated view, decorrelated into a 1-row broadcast against the
    * reused aggregate. The revenue is the exact decimal sum, so the
    * double equality against the max is engine-identical. */
  private val q73: QFn = (s, d) => {
    // both references (the max and the join) read the aggregated view
    // — cache it or the fact scan + aggregation run twice (verified:
    // Spark does not plan a ReusedExchange across the two branches)
    val rev = graft.util.DfCache.getOrBuild(s, s"rev73:$d") {
      val r = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
        .cache()
      r.count()
      r
    }
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }
  private val q73Sql =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""".stripMargin

  /** Window-function suite over one partitioned+ordered spec:
    * dense_rank, percent_rank, cume_dist, lead, and a running
    * first_value share a single Window operator (one shuffle + one
    * sort for all five). The ratio functions round at 1e-6 — both
    * engines divide the same exact integers, the round just pins the
    * textual form. */
  private val q74: QFn = (s, d) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-02-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("rnk", dense_rank().over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .withColumn("cheapest_key", first(col("o_orderkey")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
  private val q74Sql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  DENSE_RANK() OVER w AS rnk,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |  ROUND(CUME_DIST() OVER w, 6) AS cume,
      |  LEAD(o_orderkey, 1) OVER w AS next_key,
      |  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cheapest_key
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-02-01'
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin

  /** The salted skew join driven as a query: lineitem ⋈ supplier
    * through [[JoinOps.saltedJoin]], aggregated per supplier. The salt
    * is uniform-random per left row, so nothing about the OUTPUT
    * depends on it (inner-join semantics are exactly preserved; the
    * aggregate is order-free exact decimal) — which is what lets a
    * plain-SQL oracle check the skew-mitigation path end to end. */
  private val q79: QFn = (s, d) => {
    val li = Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
    JoinOps.saltedJoin(li, sup, "l_suppkey", "s_suppkey", salts = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice")).as("revenue"))
  }
  private val q79Sql =
    s"""SELECT s_name, COUNT(*) AS n_lines,
       |  ${sqlSum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_name""".stripMargin

  /** RANGE window frame over a SPARSE daily series — trailing-7-DAY
    * revenue, which differs from q28's 7-ROW moving average exactly
    * where days are missing (a RANGE frame spans value distance, not
    * row count). Integer day-number order key: numeric RANGE frames
    * are engine-identical, where interval frames invite boundary
    * semantics drift. Day-grain input → the unpartitioned window is
    * scale-safe, as in q07/q28. */
  private val q81: QFn = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("timestamp"))
        .cast("long").as("day_num"))
      .agg(sum(col("o_totalprice").cast(Dec)).as("rev_dec"))
    val w = Window.orderBy("day_num").rangeBetween(-6, 0)
    daily
      .withColumn("trailing7", sum(col("rev_dec")).over(w).cast("double"))
      .select(col("day_num"), col("rev_dec").cast("double").as("day_rev"),
        col("trailing7"))
  }
  private val q81Sql =
    """SELECT day_num, CAST(rev_dec AS DOUBLE) AS day_rev,
      |  CAST(SUM(rev_dec) OVER (ORDER BY day_num
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS trailing7
      |FROM (SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01',
      |        o_orderdate) AS BIGINT) AS day_num,
      |        SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev_dec
      |      FROM orders GROUP BY 1) t""".stripMargin

  /** Top-3 parts per supplier by revenue — the per-group top-k that,
    * unlike q09's global top-k, CANNOT funnel through one reducer:
    * the rank window keys on l_suppkey, and Spark's WindowGroupLimit
    * pushes the `rk <= 3` bound below the sort so each partition keeps
    * 3 rows per group before any shuffle-wide work. Revenue sums are
    * exact decimal; ties break on part key, so the output is fully
    * deterministic. */
  private val q96: QFn = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("revenue").desc, col("l_partkey").asc)
    rev.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("l_suppkey"), col("l_partkey"), col("revenue"),
        col("rk").cast("long").as("rk"))
  }
  private val q96Sql =
    s"""SELECT l_suppkey, l_partkey, revenue, rk FROM (
       |  SELECT l_suppkey, l_partkey, revenue,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
       |      ORDER BY revenue DESC, l_partkey ASC) AS BIGINT) AS rk
       |  FROM (
       |    SELECT l_suppkey, l_partkey,
       |      ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |    FROM lineitem GROUP BY 1, 2) r) t
       |WHERE rk <= 3""".stripMargin

  /** Reorder velocity: per nation, the share of consecutive-order
    * gaps ≤ 7 days. The lag window keys on o_custkey (partition-
    * parallel at any customer count); the dim chain
    * (customer→nation) broadcasts; deterministic tiebreak on order
    * key pins tie pairing so both engines see identical gaps. */
  private val q97: QFn = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables.orders(s, d)
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("quick",
        when(datediff(col("o_orderdate"), col("prev")) <= 7, 1L)
          .otherwise(0L))
    gaps
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("quick")).as("quick_gaps"),
        (sum(col("quick")).cast("double") / count(lit(1))).as("quick_rate"))
  }
  private val q97Sql =
    """WITH g AS (
      |  SELECT o_custkey, o_orderdate,
      |    LAG(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |q AS (
      |  SELECT o_custkey,
      |    CASE WHEN date_diff('day', prev, o_orderdate) <= 7
      |      THEN 1 ELSE 0 END AS quick
      |  FROM g WHERE prev IS NOT NULL)
      |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(SUM(quick) AS BIGINT) AS quick_gaps,
      |  CAST(SUM(quick) AS DOUBLE) / COUNT(*) AS quick_rate
      |FROM q
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** q100: calendar GAP-FILL with linear interpolation — the
    * `time_bucket_gapfill`/`interpolate` operator time-series stores
    * ship natively, over a genuinely sparse series (one supplier's
    * daily shipped quantity: ~150 ship days across a ~2-year
    * calendar). Missing days interpolate between their bracketing
    * observations: v = v_prev + (v_next − v_prev)·Δ/span.
    *
    * Scale shape: the heavy half (the daily aggregate) is a
    * distributed map-side-partial agg; everything after runs on
    * CALENDAR-sized rows (≤ tens of K for decades of days — model
    * data, not corpus data), so the global bracket windows are
    * single-partition by CONSTRUCTION, not by accident (q27's
    * documented day-grain convention). Bracket days come from
    * running max/min over null-skipping CASE projections — portable
    * to the oracle verbatim — and the bracket VALUES join back from
    * the (broadcast) daily aggregate, so no ignore-nulls struct
    * tricks the two engines could disagree on. The interpolation
    * arithmetic is scalar IEEE on decimal-exact inputs: hash-exact
    * with no rounding. */
  private val q100: QFn = (s, d) => {
    val daily = Tables.lineitem(s, d)
      .filter(col("l_suppkey") === 1)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(dsum(col("l_quantity")).as("qty"))
    val cal = daily.agg(min("day").as("mn"), max("day").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val wP = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val m = cal.join(daily, Seq("day"), "left")
      .withColumn("pd", max(when(col("qty").isNotNull, col("day"))).over(wP))
      .withColumn("nd", min(when(col("qty").isNotNull, col("day"))).over(wN))
    m.join(broadcast(daily.select(col("day").as("pd"), col("qty").as("pq"))),
        Seq("pd"))
      .join(broadcast(daily.select(col("day").as("nd"), col("qty").as("nq"))),
        Seq("nd"))
      .select(col("day"),
        when(col("qty").isNotNull, col("qty"))
          .otherwise(col("pq") + (col("nq") - col("pq")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")))).as("qty"),
        when(col("qty").isNotNull, lit("actual")).otherwise(lit("interp"))
          .as("src"))
  }
  private val q100Sql =
    s"""WITH daily AS (
       |  SELECT CAST(l_shipdate AS DATE) AS day,
       |    ${sqlSum("l_quantity")} AS qty
       |  FROM lineitem WHERE l_suppkey = 1 GROUP BY 1),
       |bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
       |cal AS (
       |  SELECT CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
       |    AS day FROM bounds),
       |m AS (
       |  SELECT c.day, d.qty,
       |    MAX(CASE WHEN d.qty IS NOT NULL THEN c.day END) OVER
       |      (ORDER BY c.day ROWS BETWEEN UNBOUNDED PRECEDING AND
       |       CURRENT ROW) AS pd,
       |    MIN(CASE WHEN d.qty IS NOT NULL THEN c.day END) OVER
       |      (ORDER BY c.day ROWS BETWEEN CURRENT ROW AND
       |       UNBOUNDED FOLLOWING) AS nd
       |  FROM cal c LEFT JOIN daily d USING (day))
       |SELECT m.day,
       |  CASE WHEN m.qty IS NOT NULL THEN m.qty
       |    ELSE p.qty + (n.qty - p.qty) *
       |      (CAST(date_diff('day', m.pd, m.day) AS DOUBLE) /
       |        date_diff('day', m.pd, m.nd)) END AS qty,
       |  CASE WHEN m.qty IS NOT NULL THEN 'actual' ELSE 'interp' END AS src
       |FROM m
       |JOIN daily p ON p.day = m.pd
       |JOIN daily n ON n.day = m.nd""".stripMargin

  /** q102: market-basket ASSOCIATION RULES over co-ordered parts —
    * support / directional confidence / lift for every part pair
    * co-occurring in ≥2 orders (an absolute floor: at any scale a
    * 1-order pair is noise, and the ratios carry the scale).
    *
    * Scale shape: the pair generation is a self-join ON THE ORDER KEY
    * — output is Σ basket²,  linear when baskets are bounded (retail
    * baskets are; a pathological mega-basket would need a basket-size
    * cap upstream) — then one hash-agg per pair. Per-part order
    * counts join back on each side of the pair (key-partitioned
    * shuffle joins; at 100 TB neither side is broadcastable and AQE
    * picks the strategy). Ratios are long/long→double divisions with
    * identical operand order in both engines; rounded at 6 dp. */
  private val q102: QFn = (s, d) => {
    val b = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val totals = b.agg(countDistinct(col("o")).as("n_orders"))
    val cnt = b.groupBy("p").agg(count(lit(1)).as("n_p"))
    val pairs = b.select(col("o"), col("p").as("part_a"))
      .join(b.select(col("o"), col("p").as("part_b")), Seq("o"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(cnt.select(col("p").as("part_a"), col("n_p").as("n_a")),
        Seq("part_a"))
      .join(cnt.select(col("p").as("part_b"), col("n_p").as("n_b")),
        Seq("part_b"))
      .crossJoin(broadcast(totals))
      .select(col("part_a"), col("part_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_orders"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_ab"),
        round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_ba"),
        round((col("n_ab").cast("double") * col("n_orders")) /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }
  private val q102Sql =
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |tot AS (SELECT COUNT(DISTINCT o) AS n_orders FROM b),
      |cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p FROM b GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS part_a, b2.p AS part_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT part_a, part_b, n_ab,
      |  ROUND(CAST(n_ab AS DOUBLE) / n_orders, 6) AS support,
      |  ROUND(CAST(n_ab AS DOUBLE) / ca.n_p, 6) AS conf_ab,
      |  ROUND(CAST(n_ab AS DOUBLE) / cb.n_p, 6) AS conf_ba,
      |  ROUND((CAST(n_ab AS DOUBLE) * n_orders) / (ca.n_p * cb.n_p), 6)
      |    AS lift
      |FROM pairs
      |JOIN cnt ca ON ca.p = part_a
      |JOIN cnt cb ON cb.p = part_b
      |CROSS JOIN tot""".stripMargin

  /** q104: robust OUTLIER DETECTION per event type — median, MAD
    * (median absolute deviation), and the count of modified-z
    * outliers (0.6745·|v−med|/MAD > 3.5, Iglewicz–Hoaglin, public) —
    * the heavy-tail-safe screen a quality pipeline runs where mean/
    * stddev would be dragged by the very outliers it hunts.
    *
    * Two grouped exact medians on the SCALE path (round 9, was
    * `percentile()` per-group value buffering): each pass runs
    * [[groupedPercentiles]] — RankOps prefix-sum ranks + broadcast
    * lo/hi probes, the q85 machinery — so no event type ever buffers
    * its values in one reducer; the K-row median tables broadcast back
    * between passes. Interpolation arithmetic is bit-identical to the
    * aggregate's (the q85/q16 shared-oracle precedent), so the oracle
    * hash is unchanged. */
  private val q104: QFn = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        col("value").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val med = groupedPercentiles(ev, "event_type", "v",
        Seq("event_id"), Seq(0.5))
      .select(col("g").as("event_type"), col("pv").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
    val mad = groupedPercentiles(
        dev.select(col("event_id"), col("event_type"),
          abs(col("v") - col("med")).as("ad")),
        "event_type", "ad", Seq("event_id"), Seq(0.5))
      .select(col("g").as("event_type"), col("pv").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(lit(0.6745) * abs(col("v") - col("med")) / col("mad")
          > lit(3.5), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"), col("n"), col("n_outliers"))
  }
  private val q104Sql =
    """WITH ev AS (
      |  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
      |  WHERE value IS NOT NULL),
      |med AS (
      |  SELECT event_type, quantile_cont(v, 0.5) AS med
      |  FROM ev GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, e.v, m.med FROM ev e JOIN med m
      |  USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(ABS(v - med), 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, ROUND(d.med, 6) AS med, ROUND(a.mad, 6) AS mad,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN 0.6745 * ABS(d.v - d.med) / a.mad > 3.5
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad a USING (event_type)
      |GROUP BY d.event_type, d.med, a.mad""".stripMargin

  /** q110: RFM SEGMENTATION (Recency/Frequency/Monetary quintiles —
    * the classic direct-marketing customer segmentation, Hughes 1994):
    * per customer, last order date / order count / exact-decimal
    * lifetime spend, each metric quintiled over ALL customers, the
    * three digits concatenated into the familiar "555"-style segment,
    * aggregated to (segment, n_customers, avg_monetary). Bucket 5 =
    * most recent / most frequent / highest spend (ascending ntile).
    *
    * Scale shape: the global quintiles are the q29-vs-q63 hazard —
    * `ntile(5) OVER (ORDER BY …)` funnels every customer through ONE
    * reducer — so all three rankings run through RankOps.withGlobalRank
    * (range-repartition + two-pass zipWithIndex, partitions follow the
    * session) + arithmetic NTILE, which q63's shared oracle pins equal
    * to the window function. Three rank passes over customer-grain
    * rows (each O(C) with a partition-count driver array), one
    * map-side-partial aggregate per metric build, and a ≤125-row
    * result. Total (metric, custkey) orders make every tiebreak
    * deterministic; customers with no orders are out of scope (no
    * RFM without a purchase). */
  private val q110: QFn = (s, d) => {
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("c"))
      .agg(max(col("o_orderdate")).as("r"),
        count(lit(1)).as("f"),
        sum(col("o_totalprice").cast(Dec)).as("m"))
    val n = per.count()
    val ranked = Seq(("r", "rb"), ("f", "fb"), ("m", "mb"))
      .foldLeft(per) { case (df, (metric, bucket)) =>
        RankOps.withGlobalRank(df,
            Seq(col(metric).asc, col("c").asc), rankCol = "rk")
          .withColumn(bucket, RankOps.ntileFromRank(col("rk"), n, 5))
          .drop("rk")
      }
    ranked
      .withColumn("segment", concat(col("rb").cast("string"),
        col("fb").cast("string"), col("mb").cast("string")))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("m")).cast("double") / count(lit(1)), 6)
          .as("avg_monetary"))
  }
  private val q110Sql =
    """WITH per AS (
      |  SELECT o_custkey AS c, MAX(o_orderdate) AS r,
      |    CAST(COUNT(*) AS BIGINT) AS f,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS m
      |  FROM orders GROUP BY 1),
      |s AS (
      |  SELECT c, m,
      |    NTILE(5) OVER (ORDER BY r, c) AS rb,
      |    NTILE(5) OVER (ORDER BY f, c) AS fb,
      |    NTILE(5) OVER (ORDER BY m, c) AS mb
      |  FROM per)
      |SELECT CAST(rb AS VARCHAR) || CAST(fb AS VARCHAR) ||
      |    CAST(mb AS VARCHAR) AS segment,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*), 6) AS avg_monetary
      |FROM s GROUP BY 1""".stripMargin

  /** q114: UNPIVOT (melt) — the inverse of q17's pivot, exercised as a
    * round trip: the status × priority count matrix pivots wide and
    * `unpivot` melts it back to long form. The oracle is the plain
    * GROUP BY the round trip must reproduce — a one-line SQL check of
    * a two-operator composition. Scale: both legs aggregate before
    * reshaping (the matrix is |status|×|priority|, model-sized);
    * unpivot itself is a zero-shuffle map-side Expand. */
  private val q114: QFn = (s, d) => {
    val pri = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val wide = Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", pri)
      .agg(count(lit(1)))
    wide.unpivot(
        ids = Array(col("o_orderstatus")),
        values = pri.map(p => col(s"`$p`")).toArray,
        variableColumnName = "o_orderpriority",
        valueColumnName = "n")
      .filter(col("n").isNotNull)
  }
  private val q114Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** q118: NATION-PAIR trade volume (TPC-H Q7 shape): revenue shipped
    * from each supplier nation to each DIFFERENT customer nation per
    * ship year — the two-dimension-table double star: the fact joins
    * supplier⋈nation once and customer⋈nation once (both broadcast
    * chains), the anti-diagonal filter runs in-row, and ONE shuffle
    * (the final agg) remains. */
  private val q118: QFn = (s, d) => {
    val n = Tables.nation(s, d)
    val l = Tables.lineitem(s, d)
    l.join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }
  private val q118Sql =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS l_year,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE sn.n_name <> cn.n_name
       |GROUP BY 1, 2, 3""".stripMargin

  /** q119: MARKET SHARE (TPC-H Q8 shape): within the AMERICA region's
    * customer revenue, the share supplied by NATION_1's suppliers per
    * order year — the conditional-aggregate-over-star form (share =
    * case-summed numerator / total, both through the exact decimal
    * accumulator, ONE pass). Ratio is one IEEE division on identical
    * decimal-derived doubles, 6 dp. */
  private val q119: QFn = (s, d) => {
    val n = Tables.nation(s, d)
    val nat = "NATION_1"
    val base = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey",
        "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"),
        col("n_regionkey"))), col("c_nationkey") === col("cnk"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .withColumn("vol", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    base.groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === nat, col("vol")).otherwise(lit(0.0))
          .cast(Dec)).cast("double") /
        sum(col("vol").cast(Dec)).cast("double"), 6).as("mkt_share"))
  }
  private val q119Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |  ROUND(
      |    CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_1'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |      AS DECIMAL(28,6))) AS DOUBLE) /
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(28,6))) AS DOUBLE), 6) AS mkt_share
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region ON cn.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE r_name = 'AMERICA'
      |GROUP BY 1""".stripMargin

  /** q120: ORDER-COUNT DISTRIBUTION (TPC-H Q13 shape): how many
    * customers placed exactly k orders — INCLUDING k = 0, which is
    * the point: the LEFT join keeps orderless customers, the first
    * aggregate counts the non-null side (count of o_orderkey, not
    * count(*)), the second aggregates the distribution. Both
    * aggregates keep map-side partials; the distribution is at most
    * max-orders rows. */
  private val q120: QFn = (s, d) => {
    Tables.customer(s, d).select("c_custkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }
  private val q120Sql =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1) cc
      |GROUP BY 1""".stripMargin

  /** q121: DISJUNCTIVE-PREDICATE revenue (TPC-H Q19 shape): an OR of
    * three (brand, size-band, quantity-band) conjunctions over
    * part⋈lineitem — the predicate form that defeats naive pushdown
    * unless the optimizer distributes the OR (Spark pushes the common
    * `p_partkey` join and evaluates the disjunction in-row post-join;
    * part broadcasts). One scalar decimal-sum output. */
  private val q121: QFn = (s, d) => {
    val p = Tables.part(s, d)
    val branch = (Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey")))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
    branch.agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .as("revenue"))
  }
  private val q121Sql =
    s"""SELECT ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 1 AND 11)
       |  OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
       |    AND l_quantity BETWEEN 10 AND 20)
       |  OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
       |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** q122: PRODUCT-LINE PROFIT by supplier nation and year (TPC-H Q9
    * shape, cost proxied by `p_retailprice` — the testdata carries no
    * partsupp): profit = Σ extprice·(1−disc) − retailprice·qty per
    * (nation, year), parts filtered by a name pattern (Q9's LIKE).
    * Star discipline: part/supplier/nation broadcast, orders joins on
    * the fact key, ONE aggregate shuffle; both product terms
    * accumulate through the exact decimal sum so the difference is
    * engine-identical. */
  private val q122: QFn = (s, d) => {
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg((dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
        dsum(col("p_retailprice") * col("l_quantity"))).as("profit"))
  }
  private val q122Sql =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} -
       |  ${sqlSum("p_retailprice * l_quantity")} AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%gear%'
       |GROUP BY 1, 2""".stripMargin

  /** q124: BENFORD first-digit screening of order totals — the
    * classic forensic-accounting / data-quality test (Benford 1938;
    * fabricated or truncated monetary data departs from the
    * log-uniform first-digit law). Digits extract EXACTLY: totals go
    * to integer cents (floor(x·100), one identical IEEE op) and the
    * first digit is the first character of the bigint's decimal
    * string — no log10 near power-of-ten boundaries to drift. The
    * expected shares log10(1+1/d) embed as LITERAL
    * shortest-round-trip doubles in BOTH engines (the q109 trick), so
    * shares, expectations, and deviations are all hash-exact. One
    * map-side digit projection + one 9-row aggregate. */
  private val benfordShares: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1 + 1.0 / d))
  private val q124: QFn = (s, d) => {
    val totals = Tables.orders(s, d)
      .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
    val n = totals.count().toDouble
    val expected = benfordShares.tail.foldLeft(
      when(col("digit") === "1", lit(benfordShares.head._2))) {
      case (acc, (dg, sh)) => acc.when(col("digit") === dg.toString, lit(sh))
    }
    totals
      .withColumn("digit", substring(col("cents").cast("string"), 1, 1))
      .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      .withColumn("share", round(col("n_orders").cast("double") / n, 6))
      .withColumn("benford", round(expected, 6))
      .withColumn("abs_dev", round(abs(
        col("n_orders").cast("double") / n - expected), 6))
  }
  private val q124Sql = {
    val cases = benfordShares.map { case (dg, sh) =>
      s"WHEN digit = '$dg' THEN $sh" }.mkString(" ")
    s"""WITH t AS (
       |  SELECT SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS digit FROM (
       |    SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
       |    FROM orders) c WHERE cents > 0),
       |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM t)
       |SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nd FROM n), 6) AS share,
       |  ROUND(CASE $cases END, 6) AS benford,
       |  ROUND(ABS(CAST(COUNT(*) AS DOUBLE) / (SELECT nd FROM n) -
       |    CASE $cases END), 6) AS abs_dev
       |FROM t GROUP BY 1""".stripMargin
  }

  /** q125: per-nation GINI COEFFICIENT of customer lifetime revenue —
    * the standard concentration/inequality measure (revenue-skew
    * monitoring; "does one whale dominate this market"). The sorted
    * form G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending in-group
    * ranks — a GLOBAL-ordering statistic, computed WITHOUT the
    * one-reducer window: in-group ranks come from
    * `RankOps.withGroupedPrefixSum` (the q85 machinery — two passes,
    * a partitions×groups list to the driver), Σ i·x and Σx accumulate
    * as exact decimals (i·x overflows double's 2⁵³ quanta at real
    * scale — decimal is correctness here, not just determinism), and
    * the closed form is one IEEE expression per nation at 6 dp. Ties
    * need no care: swapping equal x's leaves Σ i·x unchanged, so any
    * total order gives the same Gini. Hash-exact. */
  private val q125: QFn = (s, d) => {
    val rev = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(Dec)).as("rev"))
      .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("o_custkey"), col("rev"))
      .withColumn("one", lit(1L))
    val ranked = RankOps.withGroupedPrefixSum(rev, Seq("nation"),
      Seq("rev", "o_custkey"), valueCol = "one", sumCol = "rank0")
      .withColumn("i", col("rank0") + 1L)
    ranked.groupBy("nation")
      .agg(count(lit(1)).as("n_customers"),
        sum((col("i") * col("rev"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("six"),
        sum(col("rev")).as("sx"))
      .select(col("nation"), col("n_customers"),
        round((lit(2.0) * col("six").cast("double") -
          (col("n_customers") + 1).cast("double") * col("sx").cast("double"))
          / (col("n_customers").cast("double") * col("sx").cast("double")),
          6).as("gini"))
  }
  private val q125Sql =
    """WITH rev AS (
      |  SELECT n_name AS nation, o_custkey,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT nation, rev, CAST(ROW_NUMBER() OVER (PARTITION BY nation
      |    ORDER BY rev, o_custkey) AS BIGINT) AS i
      |  FROM rev)
      |SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  ROUND((2.0 * CAST(SUM(CAST(i * rev AS DECIMAL(38,6))) AS DOUBLE) -
      |    CAST(COUNT(*) + 1 AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
      |    / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)), 6)
      |    AS gini
      |FROM ranked GROUP BY 1""".stripMargin

  /** q126: LARGE-VOLUME orders (TPC-H Q18 shape) — customers whose
    * single order exceeds a quantity threshold: the IN-(grouped
    * HAVING) subquery decorrelated into aggregate + join, the
    * 100-TB plan being one map-side-partial fact aggregate (order-
    * grained, far smaller than the fact) joined back to orders on the
    * already-shuffled key, customer broadcast. Decimal quantity sums
    * so the HAVING cut is engine-identical. */
  private val q126: QFn = (s, d) => {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(Dec)).as("tq"))
      .filter(col("tq") > 250)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("tq").cast("double").as("total_qty"))
  }
  private val q126Sql =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    SUM(CAST(l_quantity AS DECIMAL(28,6))) AS tq
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 250)
      |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
      |  CAST(tq AS DOUBLE) AS total_qty
      |FROM orders JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** q127: RETURNED-ITEM revenue (TPC-H Q10 shape) — the customers
    * who returned the most value in a half-year window: selective
    * date + returnflag filters reach the scans, the order⋈lineitem
    * join shuffles on the shared key, customer/nation broadcast, and
    * the top-20 plans as TakeOrderedAndProject (per-partition partial
    * top-k). Exact decimal revenue → the desc cut and the tiebreak
    * (c_custkey) are engine-identical. */
  private val q127: QFn = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        col("l_extendedprice"), col("l_discount"))
      .groupBy("c_custkey", "c_name", "nation")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }
  private val q127Sql =
    s"""SELECT c_custkey, c_name, n_name AS nation,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM orders
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-07-01'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** q128: PROMO revenue share by ship month (TPC-H Q14 shape) —
    * conditional-aggregate ratio: both the promo slice and the total
    * accumulate as exact decimals in ONE pass (no second scan, no
    * join of two aggregates), part broadcast, ratio one fixed IEEE
    * expression at 6 dp. */
  private val q128: QFn = (s, d) => {
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(Dec)
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast(Dec))).as("p"),
        sum(rev).as("t"))
      .select(col("month"),
        round(lit(100.0) * col("p").cast("double") / col("t").cast("double"),
          6).as("promo_share"),
        col("p").cast("double").as("promo_revenue"))
  }
  private val q128Sql =
    """SELECT strftime(l_shipdate, '%Y-%m') AS month,
      |  ROUND(100.0 *
      |    CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
      |      ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(28,6))) AS DOUBLE), 6) AS promo_share,
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
      |    ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1""".stripMargin

  /** q129: SUPPLIER COUNT by part attributes (TPC-H Q16 shape,
    * adapted: the part↔supplier relation comes from observed lineitem
    * pairs — no partsupp table — and the NOT-IN exclusion set is the
    * negative-balance suppliers): the NOT IN becomes a broadcast
    * anti-join BEFORE the expensive distinct, the pair-distinct is
    * the only fact-sized shuffle, and the count-distinct rides its
    * partial-aggregate expansion. */
  private val q129: QFn = (s, d) => {
    val pairs = Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey").distinct()
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    pairs
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(Tables.part(s, d)
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }
  private val q129Sql =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_suppkey NOT IN
      |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** q130: MIN-COST supplier per part (TPC-H Q2 shape, adapted: the
    * "supply cost" is each supplier's observed average unit price for
    * the part, from lineitem — no partsupp table). The correlated
    * MIN subquery decorrelates into a per-part aggregate joined back
    * on (part, price) equality — safe on doubles ONLY because both
    * sides derive from the same exact decimal sums, so the min and
    * the candidates are bit-identical in both engines (the q73
    * discipline). Ties keep every achieving supplier (set semantics).
    * Both aggregates are map-side-partial; the join key reuses the
    * part-grained shuffle. */
  private val q130: QFn = (s, d) => {
    val l = Tables.lineitem(s, d)
    val unit = l.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((sum(col("l_extendedprice").cast(Dec)).cast("double") /
        sum(col("l_quantity").cast(Dec)).cast("double")).as("unit_price"))
    val best = unit.groupBy(col("l_partkey").as("pk"))
      .agg(min(col("unit_price")).as("mn"))
    unit.join(best,
        col("l_partkey") === col("pk") && col("unit_price") === col("mn"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), round(col("unit_price"), 6).as("unit_price"))
  }
  private val q130Sql =
    """WITH unit AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
      |      / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
      |      AS unit_price
      |  FROM lineitem GROUP BY 1, 2),
      |best AS (
      |  SELECT l_partkey AS pk, MIN(unit_price) AS mn
      |  FROM unit GROUP BY 1)
      |SELECT u.l_partkey AS p_partkey, s_suppkey, s_name,
      |  ROUND(u.unit_price, 6) AS unit_price
      |FROM unit u
      |JOIN best b ON u.l_partkey = b.pk AND u.unit_price = b.mn
      |JOIN supplier ON u.l_suppkey = s_suppkey""".stripMargin

  /** q131: IMPORTANT PARTS by value share (TPC-H Q11 shape, adapted
    * to lineitem value): parts holding more than 0.05% of total traded
    * value — the global-scalar HAVING decorrelated into a 1-row
    * broadcast against the reused part-value aggregate (cached: Spark
    * plans no ReusedExchange across the two references, the q73
    * lesson). Decimal sums both sides ⇒ the share cut is
    * engine-identical. */
  private val q131: QFn = (s, d) => {
    val v = graft.util.DfCache.getOrBuild(s, s"pval131:$d") {
      val r = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(Dec)).as("pval"))
        .cache()
      r.count()
      r
    }
    val tot = v.agg(sum(col("pval")).as("tot"))
    v.crossJoin(broadcast(tot))
      .filter(col("pval").cast("double") >
        col("tot").cast("double") * 0.0005)
      .select(col("l_partkey").as("p_partkey"),
        col("pval").cast("double").as("part_value"))
  }
  private val q131Sql =
    """WITH v AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(28,6))) AS pval
      |  FROM lineitem GROUP BY 1)
      |SELECT l_partkey AS p_partkey, CAST(pval AS DOUBLE) AS part_value
      |FROM v
      |WHERE CAST(pval AS DOUBLE) >
      |  (SELECT CAST(SUM(pval) AS DOUBLE) FROM v) * 0.0005""".stripMargin

  /** q134: per-brand PEARSON CORRELATION between quantity and
    * extended price — the screening statistic for pricing-model
    * sanity and feature-redundancy checks. NOT `corr()`: a double
    * moment accumulator is merge-order-dependent and can never gate
    * on a cross-engine hash. All five moments (Σx Σy Σxy Σx² Σy²)
    * accumulate as exact decimals in ONE map-side-partial pass, the
    * closed form is one fixed IEEE expression at 6 dp. */
  private val q134: QFn = (s, d) => {
    val x = col("l_quantity"); val y = col("l_extendedprice")
    val dd = org.apache.spark.sql.types.DecimalType(38, 6)
    val m = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(x.cast(dd)).cast("double").as("sx"),
        sum(y.cast(dd)).cast("double").as("sy"),
        sum((x * y).cast(dd)).cast("double").as("sxy"),
        sum((x * x).cast(dd)).cast("double").as("sxx"),
        sum((y * y).cast(dd)).cast("double").as("syy"))
    m.select(col("p_brand"), col("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))), 6)
        .as("pearson_r"))
  }
  private val q134Sql =
    """SELECT p_brand, COUNT(*) AS n,
      |  ROUND((COUNT(*) * CAST(SUM(CAST(l_quantity * l_extendedprice
      |      AS DECIMAL(38,6))) AS DOUBLE)
      |    - CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
      |      * CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE))
      |  / SQRT((COUNT(*) * CAST(SUM(CAST(l_quantity * l_quantity
      |      AS DECIMAL(38,6))) AS DOUBLE)
      |    - CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
      |      * CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE))
      |    * (COUNT(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice
      |      AS DECIMAL(38,6))) AS DOUBLE)
      |    - CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
      |      * CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE))),
      |    6) AS pearson_r
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1""".stripMargin

  /** q135: LAG-k AUTOCORRELATION of daily order revenue (lags 1–7) —
    * the weekly-seasonality screen. The fact table reduces FIRST to
    * the day-grained series (exact decimal sums, one map-side-partial
    * aggregate); the series is date-cardinality-sized, so the 7
    * lagged alignments are broadcast self-joins over a tiny frame —
    * nothing fact-sized moves twice. Pearson over the aligned pairs
    * with the same decimal-moment discipline as q134; lags with
    * fewer than 3 aligned days report nothing. */
  private val q135: QFn = (s, d) => {
    import s.implicits._
    val dd = org.apache.spark.sql.types.DecimalType(38, 6)
    val daily = Tables.orders(s, d)
      .groupBy(date_trunc("DAY", col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(dd)).as("rev"))
    val lags = Seq.tabulate(7)(i => i + 1).toDF("lag")
    val pairs = daily.select(col("day"), col("rev").as("x"))
      .crossJoin(broadcast(lags))
      .join(daily.select(col("day").as("d2"), col("rev").as("y")),
        col("d2") === col("day") + expr("make_interval(0,0,0,lag)"))
    val m = pairs.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast(dd)).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(dd)).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(dd)).cast("double").as("syy"))
      .filter(col("n") >= 3)
    m.select(col("lag"), col("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))), 6)
        .as("autocorr"))
  }
  private val q135Sql =
    """WITH daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      |  FROM orders GROUP BY 1),
      |pairs AS (
      |  SELECT l.lag, a.rev AS x, b.rev AS y
      |  FROM daily a
      |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
      |  JOIN daily b ON b.day = a.day + to_days(CAST(l.lag AS INTEGER))),
      |m AS (
      |  SELECT lag, COUNT(*) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
      |  FROM pairs GROUP BY 1 HAVING COUNT(*) >= 3)
      |SELECT CAST(lag AS INTEGER) AS lag, n,
      |  ROUND((n * sxy - sx * sy) /
      |    SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS autocorr
      |FROM m""".stripMargin

  /** q136: pairwise WELCH t-TESTS between market segments on order
    * value — "does segment X really spend more than Y?" with unequal
    * variances assumed (the honest default). ONE decimal-moment pass
    * over the fact table (n, Σx, Σx² per segment — map-side partial),
    * then the K²-pair statistics on the K-row aggregate: t and the
    * Welch–Satterthwaite df are fixed IEEE expressions at 6 dp.
    * Ordered pairs (a < b) so the output is a deterministic set. */
  private val q136: QFn = (s, d) => {
    val dd = org.apache.spark.sql.types.DecimalType(38, 6)
    val m = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dd)).cast("double").as("sx"),
        sum((col("o_totalprice") * col("o_totalprice")).cast(dd))
          .cast("double").as("sxx"))
      .select(col("seg"), col("n"), (col("sx") / col("n")).as("mean"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("v"))
    val a = m.select(col("seg").as("seg_a"), col("n").as("na"),
      col("mean").as("ma"), col("v").as("va"))
    val b = m.select(col("seg").as("seg_b"), col("n").as("nb"),
      col("mean").as("mb"), col("v").as("vb"))
    val se2 = col("va") / col("na") + col("vb") / col("nb")
    a.crossJoin(broadcast(b)).filter(col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("na"), col("nb"),
        round((col("ma") - col("mb")) / sqrt(se2), 6).as("t_stat"),
        round(se2 * se2 /
          ((col("va") / col("na")) * (col("va") / col("na"))
            / (col("na") - 1) +
           (col("vb") / col("nb")) * (col("vb") / col("nb"))
            / (col("nb") - 1)), 6).as("welch_df"))
  }
  private val q136Sql =
    """WITH m AS (
      |  SELECT c_mktsegment AS seg, COUNT(*) AS n,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |      / COUNT(*) AS mean,
      |    (CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6)))
      |        AS DOUBLE)
      |      - CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |        * CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |        / COUNT(*)) / (COUNT(*) - 1) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1)
      |SELECT a.seg AS seg_a, b.seg AS seg_b,
      |  a.n AS na, b.n AS nb,
      |  ROUND((a.mean - b.mean) /
      |    SQRT(a.v / a.n + b.v / b.n), 6) AS t_stat,
      |  ROUND((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n) /
      |    ((a.v / a.n) * (a.v / a.n) / (a.n - 1) +
      |     (b.v / b.n) * (b.v / b.n) / (b.n - 1)), 6) AS welch_df
      |FROM m a JOIN m b ON a.seg < b.seg""".stripMargin

  /** q137: two-sample KOLMOGOROV–SMIRNOV distance between URGENT and
    * LOW orders' value distributions — the classic distribution-drift
    * test, in the shape that scales: aggregate FIRST to per-distinct-
    * value group counts (one map-side-partial shuffle), then the
    * cumulative ECDFs run as DISTRIBUTED prefix sums over the
    * value-ordered distinct table (`RankOps.withGroupedPrefixSum` —
    * never a single-reducer global window), and the supremum is one
    * max aggregate. Integer cumulative counts ⇒ the ECDF ratios and
    * their |diff| are identical IEEE in both engines; one 6-dp row. */
  private val q137: QFn = (s, d) => {
    val base = Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_totalprice").as("v"),
        (col("o_orderpriority") === "1-URGENT").as("g1"))
    val pv = base.groupBy("v")
      .agg(count(when(col("g1"), 1)).as("c1"),
        count(when(!col("g1"), 1)).as("c2"))
      .withColumn("one", lit(1))
    val s1 = RankOps.withGroupedPrefixSum(pv, Seq("one"), Seq("v"),
      valueCol = "c1", sumCol = "p1")
    val s2 = RankOps.withGroupedPrefixSum(s1, Seq("one"), Seq("v"),
      valueCol = "c2", sumCol = "p2")
    val tot = pv.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    s2.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs((col("p1") + col("c1")).cast("double") / col("n1") -
          (col("p2") + col("c2")).cast("double") / col("n2")).as("dd"))
      .groupBy("n1", "n2")
      .agg(round(max(col("dd")), 6).as("ks_d"))
  }
  private val q137Sql =
    """WITH base AS (
      |  SELECT o_totalprice AS v,
      |    o_orderpriority = '1-URGENT' AS g1
      |  FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |pv AS (
      |  SELECT v, COUNT(CASE WHEN g1 THEN 1 END) AS c1,
      |    COUNT(CASE WHEN NOT g1 THEN 1 END) AS c2
      |  FROM base GROUP BY 1),
      |c AS (
      |  SELECT v, SUM(c1) OVER (ORDER BY v) AS s1,
      |    SUM(c2) OVER (ORDER BY v) AS s2
      |  FROM pv),
      |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |  CAST(SUM(c2) AS BIGINT) AS n2 FROM pv)
      |SELECT n1, n2,
      |  ROUND(MAX(ABS(CAST(s1 AS DOUBLE) / n1
      |    - CAST(s2 AS DOUBLE) / n2)), 6) AS ks_d
      |FROM c, tot GROUP BY 1, 2""".stripMargin

  /** q139: TPC-H Q20 shape (the correlated `qty > 0.5 * (SELECT
    * SUM…)` availability screen, re-keyed to shipped volume since the
    * test schema carries no partsupp): which (supplier, part) pairs
    * DOMINATED a part's 1995 supply — shipped strictly more than half
    * of the part's total quantity? De-correlated the way Q20 should
    * run at scale: the filtered fact aggregates ONCE per
    * (part, supplier) and ONCE per part (both map-side partial), the
    * two aggregates join on the part key (AQE co-partitions — the
    * per-part side is a pure reduction of the per-supplier side, no
    * second fact scan in the logical sense but both stay linear), the
    * dominance predicate is exact decimal (`2·sq > tq` — no float
    * threshold), and only then does the supplier dim broadcast on.
    * The share is the one float in the row: exact decimals cast to
    * double, one IEEE divide, 6 dp. */
  private val q139: QFn = (s, d) => {
    val l95 = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
    val perSupp = l95.groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast(Dec)).as("sq"))
    val perPart = perSupp.groupBy("l_partkey")
      .agg(sum(col("sq")).as("tq"))
    perSupp.join(perPart, Seq("l_partkey"))
      .filter(col("sq") * 2 > col("tq"))
      .join(broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("sq").cast("double").as("supp_qty"),
        col("tq").cast("double").as("part_qty"),
        round(col("sq").cast("double") / col("tq").cast("double"), 6)
          .as("share"))
  }
  private val q139Sql =
    """WITH l95 AS (
      |  SELECT * FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-01-01'),
      |ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(28,6))) AS sq
      |  FROM l95 GROUP BY 1, 2),
      |pt AS (SELECT l_partkey, SUM(sq) AS tq FROM ps GROUP BY 1)
      |SELECT ps.l_partkey, ps.l_suppkey, s_name,
      |  CAST(sq AS DOUBLE) AS supp_qty,
      |  CAST(tq AS DOUBLE) AS part_qty,
      |  ROUND(CAST(sq AS DOUBLE) / CAST(tq AS DOUBLE), 6) AS share
      |FROM ps JOIN pt USING (l_partkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE sq * 2 > tq""".stripMargin

  /** q140: PEARSON CHI-SQUARE test of independence between customer
    * market segment and order priority — "do segments order with
    * different urgency profiles?" The scale shape: ONE grouped count
    * over the fact join builds the K×M contingency table (map-side
    * partial; the table itself is dozens of rows no matter the data
    * size), margins are re-aggregations of that tiny table, and the
    * statistic folds the per-cell contributions — each rounded to
    * 6 dp and summed through the exact decimal accumulator so the
    * total is order-independent and bit-identical cross-engine.
    * Expected counts multiply margins as DOUBLES (row·col totals
    * overflow int64 at ~1e12 rows — the double product is the
    * overflow-safe form and scalar IEEE is deterministic). */
  private val q140: QFn = (s, d) => {
    val obs = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy("seg").agg(sum(col("o")).as("rt"))
    val colT = obs.groupBy("prio").agg(sum(col("o")).as("ct"))
    val n = obs.agg(sum(col("o")).cast("double").as("n"))
    val e = col("rt").cast("double") * col("ct").cast("double") / col("n")
    val od = col("o").cast("double")
    obs.join(rowT, Seq("seg")).join(colT, Seq("prio")).crossJoin(broadcast(n))
      .select(round((od - e) * (od - e) / e, 6).as("cell"),
        col("seg"), col("prio"))
      .agg(count(lit(1)).as("n_cells"),
        ((countDistinct(col("seg")) - 1) *
          (countDistinct(col("prio")) - 1)).as("dof"),
        round(sum(col("cell").cast(Dec)).cast("double"), 6).as("chi2"))
  }
  private val q140Sql =
    """WITH obs AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
      |    COUNT(*) AS o
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |rt AS (SELECT seg, SUM(o) AS rt FROM obs GROUP BY 1),
      |ct AS (SELECT prio, SUM(o) AS ct FROM obs GROUP BY 1),
      |n AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM obs),
      |cell AS (
      |  SELECT seg, prio,
      |    ROUND((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / (SELECT n FROM n))
      |      * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / (SELECT n FROM n))
      |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / (SELECT n FROM n)), 6) AS cell
      |  FROM obs JOIN rt USING (seg) JOIN ct USING (prio))
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
      |  CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT prio) - 1)
      |    AS BIGINT) AS dof,
      |  ROUND(CAST(SUM(CAST(cell AS DECIMAL(28,6))) AS DOUBLE), 6) AS chi2
      |FROM cell""".stripMargin

  /** q141: MANN–WHITNEY U rank-sum test between two market segments'
    * order values — the non-parametric sibling of q136 (no normality
    * assumed), with midranks for ties and the tie-corrected normal
    * approximation. The 100-TB shape mirrors q137: aggregate FIRST to
    * per-distinct-value group counts (one map-side-partial shuffle —
    * ranks depend only on the value order, so the value-keyed
    * aggregate is lossless), run the cumulative count as a
    * DISTRIBUTED prefix sum over the value-ordered distinct table
    * (`RankOps.withGroupedPrefixSum`, never a single-reducer window),
    * and fold the rank sum in INT128 decimals — 2·Σmidrank stays
    * integer-exact (midranks are half-integers; rank sums reach n²≈
    * 1e24 at 1e12 rows, past int64 but inside decimal(38)). The z
    * statistic is one fixed IEEE expression over the exact totals. */
  private val q141: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
      .select(col("o_totalprice").as("v"),
        (col("c_mktsegment") === "AUTOMOBILE").as("g1"))
    val pv = base.groupBy("v")
      .agg(count(when(col("g1"), 1)).as("c1"),
        count(when(!col("g1"), 1)).as("c2"))
      .withColumn("ctot", col("c1") + col("c2"))
      .withColumn("one", lit(1))
    val cum = RankOps.withGroupedPrefixSum(pv, Seq("one"), Seq("v"),
      valueCol = "ctot", sumCol = "cum")
    // 2·midrank of every row at value v = 2·cum + ctot + 1 (exact int)
    val tot = cum.agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      sum(col("c1").cast(dec38) *
        (col("cum") * 2 + col("ctot") + 1).cast(dec38)).as("r1x2"),
      sum((col("ctot").cast(dec38) * col("ctot").cast(dec38) *
        col("ctot").cast(dec38) - col("ctot").cast(dec38))).as("ties"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nd = n1d + n2d
    val u1 = (col("r1x2").cast("double") - n1d * (n1d + 1)) / 2
    val varU = n1d * n2d / 12 *
      ((nd + 1) - col("ties").cast("double") / (nd * (nd - 1)))
    tot.select(col("n1"), col("n2"),
      round(u1, 6).as("u1"),
      round((u1 - n1d * n2d / 2) / sqrt(varU), 6).as("z_stat"))
  }
  private val q141Sql =
    """WITH base AS (
      |  SELECT o_totalprice AS v, c_mktsegment = 'AUTOMOBILE' AS g1
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
      |pv AS (
      |  SELECT v, COUNT(CASE WHEN g1 THEN 1 END) AS c1,
      |    COUNT(CASE WHEN NOT g1 THEN 1 END) AS c2,
      |    COUNT(*) AS ctot
      |  FROM base GROUP BY 1),
      |cum AS (
      |  SELECT v, c1, c2, ctot,
      |    COALESCE(SUM(ctot) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM pv),
      |tot AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |    CAST(SUM(c2) AS BIGINT) AS n2,
      |    SUM(CAST(c1 AS DECIMAL(38,0)) *
      |      CAST(cum * 2 + ctot + 1 AS DECIMAL(38,0))) AS r1x2,
      |    SUM(CAST(ctot AS DECIMAL(38,0)) * CAST(ctot AS DECIMAL(38,0)) *
      |      CAST(ctot AS DECIMAL(38,0)) - CAST(ctot AS DECIMAL(38,0)))
      |      AS ties
      |  FROM cum)
      |SELECT n1, n2,
      |  ROUND((CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1)) / 2, 6) AS u1,
      |  ROUND(((CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1)) / 2
      |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
      |    / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12 *
      |      ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1)
      |        - CAST(ties AS DOUBLE) / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
      |          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)))), 6) AS z_stat
      |FROM tot""".stripMargin

  /** q144: KRUSKAL–WALLIS H test across ALL market segments on order
    * value — the K-group generalization of q141 (one-way ANOVA on
    * ranks, no normality assumed): midranks with ties, per-group rank
    * sums, H = 12/(n(n+1))·Σ R_g²/n_g − 3(n+1), tie-corrected by
    * 1 − Σ(t³−t)/(n³−n). Same scale discipline as q141: one
    * per-(value, group) count aggregate, the cumulative count as a
    * DISTRIBUTED prefix sum over the per-value totals, 2·Σmidrank
    * folded integer-exact per group in decimal(38); the K per-group
    * R²/n terms round to 6 dp and fold through the decimal
    * accumulator (a plain double sum over groups would be
    * accumulation-order-dependent), H one fixed IEEE expression. */
  private val q144: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_totalprice").as("v"), col("c_mktsegment").as("g"))
    val pvg = base.groupBy("v", "g").agg(count(lit(1)).as("c"))
    val pv = pvg.groupBy("v").agg(sum(col("c")).as("ctot"))
      .withColumn("one", lit(1))
    val cum = RankOps.withGroupedPrefixSum(pv, Seq("one"), Seq("v"),
      valueCol = "ctot", sumCol = "cum")
    val rg = pvg.join(cum.select("v", "ctot", "cum"), Seq("v"))
      .groupBy("g")
      .agg(sum(col("c")).as("ng"),
        sum(col("c").cast(dec38) *
          (col("cum") * 2 + col("ctot") + 1).cast(dec38)).as("rgx2"))
    val ties = cum.agg(sum(col("ctot").cast(dec38) *
      col("ctot").cast(dec38) * col("ctot").cast(dec38) -
      col("ctot").cast(dec38)).as("ties"))
    // per-group term (2R_g)²/(4 n_g) = R_g²/n_g, 6-dp then exact fold
    val terms = rg.select(col("ng"),
      round(col("rgx2").cast("double") * col("rgx2").cast("double") /
        (lit(4.0) * col("ng")), 6).as("t"))
      .agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
        sum(col("t").cast(Dec)).cast("double").as("sum_r2n"))
    val nd = col("n").cast("double")
    val h = lit(12.0) / (nd * (nd + 1)) * col("sum_r2n") -
      lit(3.0) * (nd + 1)
    terms.crossJoin(broadcast(ties))
      .select(col("n"), (col("k") - 1).as("dof"),
        round(h / (lit(1.0) - col("ties").cast("double") /
          (nd * nd * nd - nd)), 6).as("h_stat"))
  }
  private val q144Sql =
    """WITH base AS (
      |  SELECT o_totalprice AS v, c_mktsegment AS g
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |pvg AS (SELECT v, g, COUNT(*) AS c FROM base GROUP BY 1, 2),
      |pv AS (SELECT v, SUM(c) AS ctot FROM pvg GROUP BY 1),
      |cum AS (
      |  SELECT v, ctot,
      |    COALESCE(SUM(ctot) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM pv),
      |rg AS (
      |  SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
      |    SUM(CAST(c AS DECIMAL(38,0)) *
      |      CAST(cum * 2 + ctot + 1 AS DECIMAL(38,0))) AS rgx2
      |  FROM pvg JOIN cum USING (v) GROUP BY 1),
      |ties AS (
      |  SELECT SUM(CAST(ctot AS DECIMAL(38,0)) * CAST(ctot AS DECIMAL(38,0)) *
      |    CAST(ctot AS DECIMAL(38,0)) - CAST(ctot AS DECIMAL(38,0))) AS ties
      |  FROM cum),
      |terms AS (
      |  SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
      |    CAST(SUM(CAST(ROUND(CAST(rgx2 AS DOUBLE) * CAST(rgx2 AS DOUBLE) /
      |      (4.0 * ng), 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_r2n
      |  FROM rg)
      |SELECT n, k - 1 AS dof,
      |  ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)) * sum_r2n
      |      - 3 * (CAST(n AS DOUBLE) + 1))
      |    / (1.0 - CAST(ties AS DOUBLE) /
      |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |        - CAST(n AS DOUBLE))), 6) AS h_stat
      |FROM terms, ties""".stripMargin

  /** q145: A/B TWO-PROPORTION z-TEST — the experimentation readout:
    * customers hash deterministically into arms (first md5 hex digit
    * of the key, the same cross-engine-stable assignment the
    * stratified sampler q61 rides — never `rand()`), conversion =
    * placed ≥1 URGENT order, and the pooled-variance z compares arm
    * conversion rates. Scale shape: the converted-customer set is one
    * distinct (map-side partial) joined key-on-key to the customer
    * dim, then ONE aggregate row; every input to z is an integer
    * count, the statistic one fixed IEEE expression at 6 dp. */
  private val q145: QFn = (s, d) => {
    val conv = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("converted", lit(true))
    val armed = Tables.customer(s, d).select("c_custkey")
      .withColumn("arm_a",
        substring(md5(col("c_custkey").cast("string")), 1, 1) < "8")
      .join(conv, Seq("c_custkey"), "left")
      .select(col("arm_a"),
        coalesce(col("converted"), lit(false)).as("conv"))
    val t = armed.agg(
      count(when(col("arm_a"), 1)).as("n_a"),
      count(when(col("arm_a") && col("conv"), 1)).as("x_a"),
      count(when(!col("arm_a"), 1)).as("n_b"),
      count(when(!col("arm_a") && col("conv"), 1)).as("x_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val xa = col("x_a").cast("double"); val xb = col("x_b").cast("double")
    val p = (xa + xb) / (na + nb)
    t.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round((xa / na - xb / nb) /
        sqrt(p * (lit(1.0) - p) * (lit(1.0) / na + lit(1.0) / nb)), 6)
        .as("z_stat"))
  }
  private val q145Sql =
    """WITH conv AS (
      |  SELECT DISTINCT o_custkey AS c_custkey, TRUE AS converted
      |  FROM orders WHERE o_orderpriority = '1-URGENT'),
      |armed AS (
      |  SELECT substr(md5(CAST(c.c_custkey AS VARCHAR)), 1, 1) < '8'
      |      AS arm_a,
      |    COALESCE(converted, FALSE) AS conv
      |  FROM customer c LEFT JOIN conv USING (c_custkey)),
      |t AS (
      |  SELECT CAST(COUNT(CASE WHEN arm_a THEN 1 END) AS BIGINT) AS n_a,
      |    CAST(COUNT(CASE WHEN arm_a AND conv THEN 1 END) AS BIGINT) AS x_a,
      |    CAST(COUNT(CASE WHEN NOT arm_a THEN 1 END) AS BIGINT) AS n_b,
      |    CAST(COUNT(CASE WHEN NOT arm_a AND conv THEN 1 END) AS BIGINT)
      |      AS x_b
      |  FROM armed)
      |SELECT n_a, x_a, n_b, x_b,
      |  ROUND((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |      - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
      |    SQRT((CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
      |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
      |      * (1.0 - (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
      |        / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
      |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
      |    AS z_stat
      |FROM t""".stripMargin

  /** q146: REVENUE LIFT (cumulative-gain / CAP curve) — "the top
    * decile of customers carries what share of revenue?": per-customer
    * decimal revenue, a GLOBAL decile via `RankOps.withGlobalRank` +
    * `ntileFromRank` (two-pass range-partitioned ranking — NTILE's
    * single-reducer window trap at billions of customers), then the
    * cumulative share over the 10-row decile aggregate (a window over
    * EXACTLY 10 rows at any data size — the one place an unpartitioned
    * window is genuinely scale-free). Decimal sums end-to-end; the
    * two shares are fixed IEEE divides at 6 dp. */
  private val q146: QFn = (s, d) => {
    val rev = Tables.orders(s, d).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(Dec)).as("rev"))
    val n = rev.count()
    val ranked = RankOps.withGlobalRank(rev,
      Seq(col("rev").desc, col("o_custkey").asc), "rk")
    val dec = ranked
      .withColumn("decile", RankOps.ntileFromRank(col("rk"), n, 10))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_cust"), sum(col("rev")).as("drev"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = dec.agg(sum(col("drev"))).head.getDecimal(0)
    dec.withColumn("cum", sum(col("drev")).over(w))
      .select(col("decile"), col("n_cust"),
        col("drev").cast("double").as("decile_rev"),
        round(col("drev").cast("double") / lit(tot.doubleValue()), 6)
          .as("rev_share"),
        round(col("cum").cast("double") / lit(tot.doubleValue()), 6)
          .as("cum_share"))
      .orderBy("decile")
  }
  private val q146Sql =
    """WITH rev AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      |  FROM orders GROUP BY 1),
      |dec AS (
      |  SELECT NTILE(10) OVER (ORDER BY rev DESC, o_custkey ASC)
      |    AS decile, rev
      |  FROM rev),
      |agg AS (
      |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
      |    SUM(rev) AS drev
      |  FROM dec GROUP BY 1),
      |tot AS (SELECT CAST(SUM(drev) AS DOUBLE) AS t FROM agg)
      |SELECT decile, n_cust, CAST(drev AS DOUBLE) AS decile_rev,
      |  ROUND(CAST(drev AS DOUBLE) / (SELECT t FROM tot), 6) AS rev_share,
      |  ROUND(CAST(SUM(drev) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / (SELECT t FROM tot), 6) AS cum_share
      |FROM agg ORDER BY decile""".stripMargin

  /** q147: WEEKLY SEASONALITY STRENGTH of daily order revenue — the
    * STL-style variance-ratio screen (Hyndman's F_s):
    * F = max(0, 1 − Var(residual)/Var(series)) where the residual
    * removes the day-of-week means. The fact table reduces FIRST to
    * the day-grained decimal series (one map-side-partial aggregate —
    * everything after runs on ~years-of-days rows); day-of-week means
    * are fixed IEEE doubles at 6 dp (q136's discipline), per-day
    * squared deviations round to 6 dp and fold through the exact
    * decimal accumulator, the ratio is one fixed expression. */
  private val q147: QFn = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(Dec)).cast("double").as("rev"))
      .select(col("day"), col("rev"), dayofweek(col("day")).as("dow"))
    val dowMean = daily.groupBy("dow")
      .agg((sum(col("rev").cast(Dec)).cast("double") / count(lit(1)))
        .as("dmean"))
    val overall = daily.agg(
      (sum(col("rev").cast(Dec)).cast("double") / count(lit(1))).as("gmean"),
      count(lit(1)).as("n"))
    daily.join(broadcast(dowMean), Seq("dow")).crossJoin(broadcast(overall))
      .select(col("n"),
        round((col("rev") - col("gmean")) * (col("rev") - col("gmean")), 6)
          .as("tot2"),
        round((col("rev") - col("dmean")) * (col("rev") - col("dmean")), 6)
          .as("res2"))
      .groupBy("n")
      .agg(
        round(sum(col("tot2").cast(Dec)).cast("double") / col("n"), 6)
          .as("var_total"),
        round(sum(col("res2").cast(Dec)).cast("double") / col("n"), 6)
          .as("var_residual"),
        round(greatest(lit(0.0),
          lit(1.0) - sum(col("res2").cast(Dec)).cast("double") /
            sum(col("tot2").cast(Dec)).cast("double")), 6)
          .as("seasonality_strength"))
  }
  private val q147Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY 1),
      |d2 AS (SELECT day, rev, dayofweek(day) + 1 AS dow FROM daily),
      |dm AS (
      |  SELECT dow, CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE)
      |      / COUNT(*) AS dmean
      |  FROM d2 GROUP BY 1),
      |ov AS (
      |  SELECT CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE)
      |      / COUNT(*) AS gmean,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM d2),
      |sq AS (
      |  SELECT n, ROUND((rev - gmean) * (rev - gmean), 6) AS tot2,
      |    ROUND((rev - dmean) * (rev - dmean), 6) AS res2
      |  FROM d2 JOIN dm USING (dow), ov)
      |SELECT n,
      |  ROUND(CAST(SUM(CAST(tot2 AS DECIMAL(28,6))) AS DOUBLE) / n, 6)
      |    AS var_total,
      |  ROUND(CAST(SUM(CAST(res2 AS DECIMAL(28,6))) AS DOUBLE) / n, 6)
      |    AS var_residual,
      |  ROUND(GREATEST(0.0, 1.0 -
      |    CAST(SUM(CAST(res2 AS DECIMAL(28,6))) AS DOUBLE) /
      |    CAST(SUM(CAST(tot2 AS DECIMAL(28,6))) AS DOUBLE)), 6)
      |    AS seasonality_strength
      |FROM sq GROUP BY n""".stripMargin

  /** q148: CUSUM CHANGE-POINT screen on the daily order-count series
    * — where does the cumulative deviation from the global mean peak
    * (Page 1954's shape, the level-shift detector)? The fact reduces
    * to day-grained integer counts; the cumulative count runs as a
    * DISTRIBUTED prefix sum (`RankOps.withGroupedPrefixSum` — a date
    * series outlives driver memory at sensor scale) and
    * S_i = prefix_i − i·(N/D) is one fixed IEEE expression over exact
    * integers; the argmax takes a day-tiebroken max aggregate. */
  private val q148: QFn = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("one", lit(1))
    val cum = RankOps.withGroupedPrefixSum(daily, Seq("one"), Seq("day"),
      valueCol = "c", sumCol = "cumBefore")
    val rk = RankOps.withGlobalRank(cum, Seq(col("day").asc), "i")
    val tot = daily.agg(sum(col("c")).as("nn"), count(lit(1)).as("dd"))
    val sAbs = abs((col("cumBefore") + col("c")).cast("double") -
      col("i").cast("double") *
        (col("nn").cast("double") / col("dd").cast("double")))
    val scored = rk.crossJoin(broadcast(tot))
      .select(col("day"), round(sAbs, 6).as("s_abs"))
    // deterministic argmax: max |S|, earliest day on ties
    val m = scored.agg(max(col("s_abs")).as("s_abs"))
    scored.join(broadcast(m), Seq("s_abs"))
      .groupBy("s_abs").agg(min(col("day")).as("change_day"))
      .select(col("change_day"), col("s_abs"))
  }
  private val q148Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS c
      |  FROM orders GROUP BY 1),
      |cum AS (
      |  SELECT day, c,
      |    COALESCE(SUM(c) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cumBefore,
      |    ROW_NUMBER() OVER (ORDER BY day) AS i
      |  FROM daily),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
      |  CAST(COUNT(*) AS BIGINT) AS dd FROM daily),
      |scored AS (
      |  SELECT day,
      |    ROUND(ABS(CAST(cumBefore + c AS DOUBLE) -
      |      CAST(i AS DOUBLE) *
      |        (CAST(nn AS DOUBLE) / CAST(dd AS DOUBLE))), 6) AS s_abs
      |  FROM cum, tot),
      |m AS (SELECT MAX(s_abs) AS s_abs FROM scored)
      |SELECT MIN(day) AS change_day, s_abs
      |FROM scored JOIN m USING (s_abs)
      |GROUP BY s_abs""".stripMargin

  /** q151: SUPPLIER-CONCENTRATION screen per nation — the
    * Herfindahl–Hirschman index of lineitem revenue across a nation's
    * suppliers, the standard market-concentration statistic (≈1/k for
    * k equal suppliers; → 1 as one supplier dominates). In a data
    * pipeline this is the "one supplier feeds this whole partition"
    * alarm. Scale shape: ONE fact-sized shuffle (the (suppkey)
    * pre-aggregate with map-side partials), dims broadcast; the share
    * math runs over supplier-count-sized rows. Cross-engine equality:
    * revenue as exact decimals, each squared share rounded to 12 dp
    * and accumulated as a decimal (double summation order never
    * matters), final HHI one fixed IEEE rounding. */
  private val q151: QFn = (s, d) => {
    val srev = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(Dec)).as("srev"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("srev"))
    val tot = srev.groupBy("nation")
      .agg(sum(col("srev")).as("trev"), count(lit(1)).as("n_suppliers"))
    srev.join(broadcast(tot), Seq("nation"))
      .select(col("nation"), col("n_suppliers"),
        round(pow(col("srev").cast("double") / col("trev").cast("double"),
          2.0), 12).as("sh2"))
      .groupBy("nation")
      .agg(first(col("n_suppliers")).as("n_suppliers"),
        sum(col("sh2").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .as("h"))
      .select(col("nation"), col("n_suppliers"),
        round(col("h").cast("double"), 6).as("hhi"))
  }
  private val q151Sql =
    """WITH srev AS (
      |  SELECT n_name AS nation, l_suppkey,
      |    SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(28,6))) AS srev
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT nation, SUM(srev) AS trev,
      |    CAST(COUNT(*) AS BIGINT) AS n_suppliers
      |  FROM srev GROUP BY 1)
      |SELECT nation, n_suppliers,
      |  ROUND(CAST(SUM(CAST(ROUND(
      |    POW(CAST(srev AS DOUBLE) / CAST(trev AS DOUBLE), 2), 12)
      |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS hhi
      |FROM srev JOIN tot USING (nation)
      |GROUP BY 1, 2""".stripMargin

  /** q153: THEIL INEQUALITY DECOMPOSITION of customer revenue — the
    * entropy-based inequality index, whose defining property over
    * Gini (q125) is EXACT additive decomposition: total inequality =
    * Σ (nation share) · T_within(nation) + T_between(nations). One
    * row per nation with its within-nation Theil plus its between
    * contribution — the screen for "is revenue inequality a
    * within-market or across-market phenomenon". Scale shape: one
    * fact-sized (custkey) pre-aggregate; everything after runs on
    * customer- then nation-sized rows with decimal accumulators; no
    * windows. Cross-engine: each x·ln(x/μ) term rounded to 6 dp and
    * decimal-summed (q142's libm discipline), finals fixed IEEE. */
  private val q153: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 6)
    val crev = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(Dec)).as("rev"))
      .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("rev"))
    val nat = crev.groupBy("nation")
      .agg(count(lit(1)).as("n_customers"), sum(col("rev")).as("nrev"))
    val glob = nat.agg(sum(col("n_customers")).as("gn"),
      sum(col("nrev")).as("grev"))
    // within: T_g = (1/n_g) Σ_i (x_i/μ_g) ln(x_i/μ_g)
    val mu = col("nrev").cast("double") / col("n_customers").cast("double")
    val r = col("rev").cast("double") / mu
    val within = crev.join(broadcast(nat), Seq("nation"))
      .select(col("nation"),
        round(r * log(r), 6).as("t"))
      .groupBy("nation")
      .agg(sum(col("t").cast(dec38)).as("st"))
    // between: nation g contributes s_g ln(μ_g/μ) with s_g = revenue share
    nat.join(broadcast(within), Seq("nation")).crossJoin(broadcast(glob))
      .select(col("nation"), col("n_customers"),
        round(col("st").cast("double") / col("n_customers").cast("double"),
          6).as("theil_within"),
        round((col("nrev").cast("double") / col("grev").cast("double")) *
          log((col("nrev").cast("double") / col("n_customers").cast("double"))
            / (col("grev").cast("double") / col("gn").cast("double"))), 6)
          .as("theil_between_part"))
  }
  private val q153Sql =
    """WITH crev AS (
      |  SELECT n_name AS nation,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, o_custkey),
      |nat AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |    SUM(rev) AS nrev
      |  FROM crev GROUP BY 1),
      |gtot AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS gn,
      |    SUM(nrev) AS grev FROM nat),
      |w AS (
      |  SELECT nation, SUM(CAST(ROUND(
      |      (CAST(rev AS DOUBLE) /
      |        (CAST(nrev AS DOUBLE) / CAST(n_customers AS DOUBLE))) *
      |      ln(CAST(rev AS DOUBLE) /
      |        (CAST(nrev AS DOUBLE) / CAST(n_customers AS DOUBLE))), 6)
      |    AS DECIMAL(38,6))) AS st
      |  FROM crev JOIN nat USING (nation) GROUP BY 1)
      |SELECT nation, n_customers,
      |  ROUND(CAST(st AS DOUBLE) / CAST(n_customers AS DOUBLE), 6)
      |    AS theil_within,
      |  ROUND((CAST(nrev AS DOUBLE) / CAST(grev AS DOUBLE)) *
      |    ln((CAST(nrev AS DOUBLE) / CAST(n_customers AS DOUBLE)) /
      |      (CAST(grev AS DOUBLE) / CAST(gn AS DOUBLE))), 6)
      |    AS theil_between_part
      |FROM nat JOIN w USING (nation) CROSS JOIN gtot""".stripMargin

  /** q154: TPC-H Q12 shape (shipping modes and order priority) adapted
    * to this schema — the dataset carries no l_shipmode, so the mode
    * dimension is l_linestatus and the "late shipment" predicate is
    * ship-after-order beyond 60 days (q57's established delay axis):
    * per line-status, how many LATE-shipped lines belonged to
    * critical-priority orders vs not. The Q12 plan shape is the point:
    * fact–fact join on orderkey with the fact-side filter pushed below
    * the join, then one tiny grouped conditional aggregate — no
    * windows, no subqueries. Integer counts only; hash-exact. */
  private val q154: QFn = (s, d) => {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
      .groupBy(col("l_linestatus").as("linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
  }
  private val q154Sql =
    """SELECT l_linestatus AS linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND date_diff('day', CAST(o_orderdate AS DATE),
      |        CAST(l_shipdate AS DATE)) > 60
      |GROUP BY 1""".stripMargin

  /** q155: SPEARMAN RANK CORRELATION between line quantity and
    * extended price — the monotone-association screen that survives
    * outliers and nonlinearity where q134's Pearson does not. The
    * whole computation is INTEGER-EXACT until the final ratio:
    * midranks come from per-distinct-value counts + distributed
    * prefix sums (`RankOps.withGroupedPrefixSum`, q141's discipline —
    * no per-row window, a 100-TB fact never serializes through one
    * task), each row's DOUBLED midrank 2r = 2·cumBefore + count + 1
    * is an exact integer, and all five regression moments (Σx, Σy,
    * Σx², Σy², Σxy over the doubled ranks) fold as DECIMAL(38,0) —
    * n·(2n)² ≈ 4n³ stays inside 38 digits to n ≈ 10¹¹ rows. Spearman
    * ρ is then ONE fixed IEEE expression over those exact integers;
    * ties handled exactly by construction (midranks ARE the tie
    * correction). Scale shape: two tiny distinct-value rank tables
    * (quantity has ~50 values; price ranks shuffle-join back on
    * value), one fact-sized moment fold. Hash-exact. */
  private val q155: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = Tables.lineitem(s, d)
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    def rankTable(c: String): DataFrame = {
      val pv = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("one", lit(1))
      RankOps.withGroupedPrefixSum(pv, Seq("one"), Seq(c),
          valueCol = "cnt", sumCol = "cum")
        .select(col(c), (col("cum") * 2 + col("cnt") + 1).as(s"r2_$c"))
    }
    val withRanks = base
      .join(rankTable("x"), Seq("x"))
      .join(rankTable("y"), Seq("y"))
      .select(col("r2_x").cast(dec38).as("rx"),
        col("r2_y").cast(dec38).as("ry"))
    val m = withRanks.agg(
      count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"),
      sum(col("rx") * col("ry")).as("sxy"))
    val nd = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    val cov = nd * dd("sxy") - dd("sx") * dd("sy")
    val vx = nd * dd("sxx") - dd("sx") * dd("sx")
    val vy = nd * dd("syy") - dd("sy") * dd("sy")
    m.select(col("n"), round(cov / sqrt(vx * vy), 6).as("spearman_rho"))
  }
  private val q155Sql =
    """WITH base AS (
      |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
      |rx AS (
      |  SELECT x, CAST(2 * COALESCE(SUM(cnt) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + cnt + 1 AS DECIMAL(38,0)) AS r2_x
      |  FROM (SELECT x, COUNT(*) AS cnt FROM base GROUP BY 1) t),
      |ry AS (
      |  SELECT y, CAST(2 * COALESCE(SUM(cnt) OVER (ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + cnt + 1 AS DECIMAL(38,0)) AS r2_y
      |  FROM (SELECT y, COUNT(*) AS cnt FROM base GROUP BY 1) t),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(r2_x) AS sx, SUM(r2_y) AS sy,
      |    SUM(r2_x * r2_x) AS sxx, SUM(r2_y * r2_y) AS syy,
      |    SUM(r2_x * r2_y) AS sxy
      |  FROM base JOIN rx USING (x) JOIN ry USING (y))
      |SELECT n,
      |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |    AS spearman_rho
      |FROM m""".stripMargin

  /** q160: CRAMÉR'S V effect size over the (market segment × order
    * status) contingency — the "is this association big" companion to
    * q140's "is it significant" chi-square (χ² grows with n, V does
    * not). Same scale shape as q140: one cell-count aggregate
    * (map-side partials), two tiny marginal tables, broadcast joins;
    * each cell's χ² contribution rounds to 6 dp before the exact
    * decimal fold, and V = sqrt(χ²/(n·min(r−1,c−1))) is one fixed
    * IEEE expression over the exact totals. */
  private val q160: QFn = (s, d) => {
    val obs = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy("seg").agg(sum(col("o")).as("rt"))
    val colT = obs.groupBy("status").agg(sum(col("o")).as("ct"))
    val n = obs.agg(sum(col("o")).cast("double").as("n"))
    val e = col("rt").cast("double") * col("ct").cast("double") / col("n")
    val od = col("o").cast("double")
    obs.join(rowT, Seq("seg")).join(colT, Seq("status"))
      .crossJoin(broadcast(n))
      .select(round((od - e) * (od - e) / e, 6).as("cell"),
        col("seg"), col("status"), col("n"))
      .agg(
        first(col("n")).cast("long").as("n"),
        least(countDistinct(col("seg")) - 1,
          countDistinct(col("status")) - 1).as("min_dof"),
        round(sum(col("cell").cast(Dec)).cast("double"), 6).as("chi2"))
      .select(col("n"), col("min_dof"), col("chi2"),
        round(sqrt(col("chi2") /
          (col("n").cast("double") * col("min_dof").cast("double"))), 6)
          .as("cramers_v"))
  }
  private val q160Sql =
    """WITH obs AS (
      |  SELECT c_mktsegment AS seg, o_orderstatus AS status,
      |    COUNT(*) AS o
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |rt AS (SELECT seg, SUM(o) AS rt FROM obs GROUP BY 1),
      |ct AS (SELECT status, SUM(o) AS ct FROM obs GROUP BY 1),
      |nn AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM obs),
      |cell AS (
      |  SELECT seg, status,
      |    ROUND((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / (SELECT n FROM nn))
      |      * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / (SELECT n FROM nn))
      |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / (SELECT n FROM nn)), 6) AS cell
      |  FROM obs JOIN rt USING (seg) JOIN ct USING (status)),
      |m AS (
      |  SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n,
      |    CAST(LEAST(COUNT(DISTINCT seg) - 1,
      |      COUNT(DISTINCT status) - 1) AS BIGINT) AS min_dof,
      |    ROUND(CAST(SUM(CAST(cell AS DECIMAL(28,6))) AS DOUBLE), 6) AS chi2
      |  FROM cell)
      |SELECT n, min_dof, chi2,
      |  ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) * CAST(min_dof AS DOUBLE))), 6)
      |    AS cramers_v
      |FROM m""".stripMargin

  /** q163: QUANTITY-WEIGHTED MEDIAN of extended price per return
    * flag — the weighted-quantile shape (each line counts l_quantity
    * times, the robust "typical price per unit moved"). Scale shape:
    * aggregate FIRST to per-distinct-price weight totals (tiny —
    * price×flag cardinality, map-side partials), run the cumulative
    * weight as a DISTRIBUTED prefix sum over the price-ordered
    * distinct table (`RankOps.withGroupedPrefixSum` — never a
    * single-reducer window), then keep the lowest price whose
    * INCLUSIVE cumulative weight reaches half the total. Weights are
    * integral by data contract (cast asserts it), so the half-total
    * comparison is integer-exact: 2·(cum+w) ≥ total in longs. */
  private val q163: QFn = (s, d) => {
    val perPrice = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("price"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
    val tot = perPrice.groupBy("flag").agg(sum(col("w")).as("wt"))
    val cum = graft.operators.RankOps.withGroupedPrefixSum(
      perPrice, Seq("flag"), Seq("price"), "w", "cum_before")
    // per-flag totals are |flags| rows — broadcast, or the 3-key join
    // serializes the whole distinct-price table through 3 tasks
    cum.join(broadcast(tot), Seq("flag"))
      .filter((col("cum_before") + col("w")) * 2 >= col("wt"))
      .groupBy(col("flag"))
      .agg(min(col("price")).as("weighted_median"),
        first(col("wt")).as("total_weight"))
  }
  private val q163Sql =
    """WITH per_price AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS price,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT flag, price, w,
      |    CAST(COALESCE(SUM(w) OVER (PARTITION BY flag ORDER BY price
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_before,
      |    CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS wt
      |  FROM per_price)
      |SELECT flag, MIN(price) AS weighted_median,
      |  CAST(MIN(wt) AS BIGINT) AS total_weight
      |FROM cum
      |WHERE (cum_before + w) * 2 >= wt
      |GROUP BY flag""".stripMargin

  /** q164: SKEWNESS and EXCESS KURTOSIS of order value per priority —
    * the distribution-shape profile (a heavy right tail shows as
    * skew > 0, fat tails as kurtosis > 0). TWO-PASS centered moments,
    * never raw Σx⁴ (whose decimal magnitude would overflow 38 digits
    * at petabyte row counts): pass 1 pins the 6-dp group mean through
    * the exact decimal average; pass 2 computes per-row centered
    * powers in deterministic scalar IEEE (d, d², d³, d⁴ identical in
    * any engine), rounds each to 6 dp, and folds them through the
    * decimal accumulator. Final ratios are fixed IEEE expressions
    * over the exact sums. */
  private val q164: QFn = (s, d) => {
    // d³/d⁴ magnitudes need 38-digit headroom (|d| ≈ 1e5 ⇒ d⁴ ≈ 1e20;
    // the fold stays inside 38 digits to ~1e12 rows)
    val BigDec = org.apache.spark.sql.types.DecimalType(38, 6)
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        col("o_totalprice").as("x"))
    val mu = o.groupBy("prio")
      .agg(round(graft.util.Exact.davg(col("x")), 6).as("mu"),
        count(lit(1)).as("n"))
    val dd = col("x") - col("mu")
    o.join(broadcast(mu), Seq("prio"))
      .select(col("prio"), col("n"),
        round(dd * dd, 6).as("d2"),
        round(dd * dd * dd, 6).as("d3"),
        round(dd * dd * dd * dd, 6).as("d4"))
      .groupBy("prio")
      .agg(first(col("n")).as("n"),
        sum(col("d2").cast(Dec)).cast("double").as("m2s"),
        sum(col("d3").cast(BigDec)).cast("double").as("m3s"),
        sum(col("d4").cast(BigDec)).cast("double").as("m4s"))
      .select(col("prio"), col("n"),
        round(
          (col("m3s") / col("n")) /
            pow(col("m2s") / col("n"), lit(1.5)), 6).as("skewness"),
        round(
          (col("m4s") / col("n")) /
            ((col("m2s") / col("n")) * (col("m2s") / col("n"))) - 3.0,
          6).as("excess_kurtosis"))
  }
  private val q164Sql =
    s"""WITH mu AS (
       |  SELECT o_orderpriority AS prio,
       |    ROUND(${graft.util.Exact.sqlAvg("o_totalprice")}, 6) AS mu,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM orders GROUP BY 1),
       |ctr AS (
       |  SELECT prio, n,
       |    ROUND((o_totalprice - mu) * (o_totalprice - mu), 6) AS d2,
       |    ROUND((o_totalprice - mu) * (o_totalprice - mu) * (o_totalprice - mu), 6) AS d3,
       |    ROUND((o_totalprice - mu) * (o_totalprice - mu) * (o_totalprice - mu) * (o_totalprice - mu), 6) AS d4
       |  FROM orders JOIN mu ON o_orderpriority = prio),
       |m AS (
       |  SELECT prio, MIN(n) AS n,
       |    CAST(SUM(CAST(d2 AS DECIMAL(28,6))) AS DOUBLE) AS m2s,
       |    CAST(SUM(CAST(d3 AS DECIMAL(38,6))) AS DOUBLE) AS m3s,
       |    CAST(SUM(CAST(d4 AS DECIMAL(38,6))) AS DOUBLE) AS m4s
       |  FROM ctr GROUP BY 1)
       |SELECT prio, n,
       |  ROUND((m3s / n) / POW(m2s / n, 1.5), 6) AS skewness,
       |  ROUND((m4s / n) / ((m2s / n) * (m2s / n)) - 3.0, 6)
       |    AS excess_kurtosis
       |FROM m""".stripMargin

  /** q167: CUSTOMER VALUE-QUINTILE MIGRATION 1996 → 1997 — the
    * cohort-movement matrix behind churn/upsell analysis ("how many
    * top-quintile customers slid to the bottom"). Per-year revenue
    * quintiles come from the two-pass GLOBAL rank
    * (`RankOps.withGlobalRank` + the NTILE-exact `ntileFromRank` —
    * a 100-TB customer table never serializes through one window
    * task), customers present in both years join on the key, and the
    * matrix is one tiny grouped count. Quintile boundaries match
    * SQL NTILE in both engines by construction. */
  private val q167: QFn = (s, d) => {
    def quintiles(year: Int, out: String) = {
      val rev = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(Dec)).as("rev"))
      val n = rev.count()
      RankOps.withGlobalRank(rev,
        Seq(col("rev").desc, col("o_custkey").asc), "rk")
        .select(col("o_custkey"),
          RankOps.ntileFromRank(col("rk"), n, 5).as(out))
    }
    quintiles(1996, "q_1996").join(quintiles(1997, "q_1997"), "o_custkey")
      .groupBy("q_1996", "q_1997")
      .agg(count(lit(1)).as("n_cust"))
  }
  private val q167Sql =
    """WITH r96 AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1),
      |r97 AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1),
      |d96 AS (
      |  SELECT o_custkey,
      |    CAST(NTILE(5) OVER (ORDER BY rev DESC, o_custkey ASC) AS INT)
      |      AS q_1996
      |  FROM r96),
      |d97 AS (
      |  SELECT o_custkey,
      |    CAST(NTILE(5) OVER (ORDER BY rev DESC, o_custkey ASC) AS INT)
      |      AS q_1997
      |  FROM r97)
      |SELECT q_1996, q_1997, CAST(COUNT(*) AS BIGINT) AS n_cust
      |FROM d96 JOIN d97 USING (o_custkey)
      |GROUP BY 1, 2""".stripMargin

  /** q168: CUSTOMER LIFETIME SURVIVAL CURVE — the fraction of
    * customers whose ordering lifetime (first → last order) reaches
    * each threshold, the discrete survival function behind retention
    * dashboards. One per-customer min/max aggregate (map-side
    * partials), lifetimes in exact integer days, then a 6-row
    * threshold explode and one tiny count — never a per-customer
    * window. */
  private val q168: QFn = (s, d) => {
    val life = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate")))
        .cast("long").as("life_days"))
    val n = life.count()
    life.select(explode(array(
        lit(30L), lit(90L), lit(180L), lit(365L), lit(730L), lit(1460L)))
        .as("k_days"), col("life_days"))
      .groupBy("k_days")
      .agg(sum(when(col("life_days") >= col("k_days"), 1L).otherwise(0L))
        .as("n_surviving"))
      .select(col("k_days"), col("n_surviving"),
        round(col("n_surviving").cast("double") / lit(n.toDouble), 6)
          .as("survival"))
  }
  private val q168Sql =
    """WITH life AS (
      |  SELECT o_custkey,
      |    CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
      |      CAST(MAX(o_orderdate) AS DATE)) AS BIGINT) AS life_days
      |  FROM orders GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM life),
      |k AS (SELECT unnest([30, 90, 180, 365, 730, 1460]) AS k_days)
      |SELECT CAST(k_days AS BIGINT) AS k_days,
      |  CAST(SUM(CASE WHEN life_days >= k_days THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_surviving,
      |  ROUND(CAST(SUM(CASE WHEN life_days >= k_days THEN 1 ELSE 0 END)
      |    AS DOUBLE) / (SELECT n FROM n), 6) AS survival
      |FROM life, k
      |GROUP BY 1""".stripMargin

  /** q169: LOG-LOG OLS of extended price on quantity — the price-
    * elasticity regression shape (a slope near 1 on this schema just
    * says price ≈ unit price × quantity; the point is the FULL OLS
    * output: slope, intercept, R², residual σ — q134's correlation
    * upgraded to the fitted model). Per-row ln() rounds to 6 dp
    * (deterministic scalar IEEE; the q59 libm discipline) and all
    * five moments fold through the exact decimal accumulator; the
    * closed-form estimates are fixed IEEE expressions over those
    * exact sums. One map-side-partial aggregate over the fact table —
    * no shuffle beyond the single 1-row reduce. */
  private val q169: QFn = (s, d) => {
    val BigDec = org.apache.spark.sql.types.DecimalType(38, 6)
    val base = Tables.lineitem(s, d)
      .select(round(log(col("l_quantity")), 6).as("x"),
        round(log(col("l_extendedprice")), 6).as("y"))
    val m = base.select(
      round(col("x") * col("x"), 6).as("xx"),
      round(col("y") * col("y"), 6).as("yy"),
      round(col("x") * col("y"), 6).as("xy"),
      col("x"), col("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(Dec)).cast("double").as("sx"),
        sum(col("y").cast(Dec)).cast("double").as("sy"),
        sum(col("xx").cast(BigDec)).cast("double").as("sxx"),
        sum(col("yy").cast(BigDec)).cast("double").as("syy"),
        sum(col("xy").cast(BigDec)).cast("double").as("sxy"))
    val nD = col("n").cast("double")
    val covN = nD * col("sxy") - col("sx") * col("sy")
    val varX = nD * col("sxx") - col("sx") * col("sx")
    val varY = nD * col("syy") - col("sy") * col("sy")
    m.select(col("n"),
      round(covN / varX, 6).as("slope"),
      round((col("sy") - (covN / varX) * col("sx")) / nD, 6)
        .as("intercept"),
      round((covN * covN) / (varX * varY), 6).as("r2"),
      round(sqrt((varY - covN * covN / varX) / (nD * nD)), 6)
        .as("resid_sigma"))
  }
  private val q169Sql =
    """WITH base AS (
      |  SELECT ROUND(ln(l_quantity), 6) AS x,
      |    ROUND(ln(l_extendedprice), 6) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      |  FROM base)
      |SELECT n,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |  ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
      |    / n, 6) AS intercept,
      |  ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
      |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
      |  ROUND(SQRT(((n * syy - sy * sy)
      |      - (n * sxy - sx * sy) * (n * sxy - sx * sy)
      |        / (n * sxx - sx * sx))
      |    / (CAST(n AS DOUBLE) * n)), 6) AS resid_sigma
      |FROM m""".stripMargin

  /** q170: BASKET JACCARD — co-purchase similarity for part pairs
    * co-ordered ≥ 2 times: |A∩B| / |A∪B| over the order sets, the
    * set-overlap complement of q102's confidence/lift (lift is
    * independence-relative; Jaccard is size-normalized and symmetric).
    * Same bounded pair machinery: distinct (order, part), pairs
    * self-join ON the order key (Σ basket² output, linear for bounded
    * baskets), per-part order counts join back key-partitioned; top
    * 20 by the ROUNDED score with a pair tiebreak so both engines
    * rank identically. */
  private val q170: QFn = (s, d) => {
    // materialize the distinct basket relation ONCE (r14): the two
    // self-join branches each re-ran the lineitem scan + distinct
    // (profiled: two concurrent 0.5 s stages writing the same 6.2 MB)
    val b = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .cutLineage()
    val cnt = b.groupBy("p").agg(count(lit(1)).as("n_p"))
    val pairs = b.select(col("o"), col("p").as("part_a"))
      .join(b.select(col("o"), col("p").as("part_b")), Seq("o"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(cnt.select(col("p").as("part_a"), col("n_p").as("n_a")),
        Seq("part_a"))
      .join(cnt.select(col("p").as("part_b"), col("n_p").as("n_b")),
        Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("n_ab"),
        round(col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
  }
  private val q170Sql =
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p FROM b GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS part_a, b2.p AS part_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 2)
      |SELECT part_a, part_b, n_ab,
      |  ROUND(CAST(n_ab AS DOUBLE) / (ca.n_p + cb.n_p - n_ab), 6)
      |    AS jaccard
      |FROM pairs
      |JOIN cnt ca ON ca.p = part_a
      |JOIN cnt cb ON cb.p = part_b
      |ORDER BY jaccard DESC, part_a ASC, part_b ASC
      |LIMIT 20""".stripMargin

  /** q172: COCHRAN–ARMITAGE TREND TEST — is the return rate
    * MONOTONICALLY associated with order quantity? q140's chi-square
    * asks "any association"; CA weights the 2×k table by ordered
    * dose scores (quantity decade 1..5), so it has power against the
    * trend alternative specifically (Armitage 1955, Biometrics 11).
    * Scale shape: one map-side-partial aggregate to the k-row
    * (level, n, returned) table, the score sums Σt·n / Σt·r / Σt²·n
    * fold integer-exact through decimal(38) (t ≤ 5, so Σt²n ≈ 25·rows
    * — past int64 only near 1e18 rows, but the discipline is uniform),
    * and T = Σt·r − p·Σt·n, Var T = p(1−p)(Σt²n − (Σtn)²/N), z =
    * T/√Var are ONE fixed IEEE expression over the exact totals.
    * Exact, hash-checked. */
  private val q172: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val lvl = (floor((col("l_quantity") - lit(1.0)) / 10) + 1)
      .cast("long")
    val byLvl = Tables.lineitem(s, d)
      .select(lvl.as("t"), (col("l_returnflag") === "R").as("ret"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"), count(when(col("ret"), 1)).as("r"))
    val tot = byLvl.agg(
      count(lit(1)).as("n_levels"),
      sum(col("n").cast(dec38)).as("nn"),
      sum(col("r").cast(dec38)).as("rr"),
      sum((col("t") * col("n")).cast(dec38)).as("stn"),
      sum((col("t") * col("r")).cast(dec38)).as("str"),
      sum((col("t") * col("t") * col("n")).cast(dec38)).as("st2n"))
    val nD = col("nn").cast("double")
    val p = col("rr").cast("double") / nD
    val tStat = col("str").cast("double") - p * col("stn").cast("double")
    val varT = p * (lit(1.0) - p) *
      (col("st2n").cast("double") -
        col("stn").cast("double") * col("stn").cast("double") / nD)
    tot.select(col("n_levels"),
      col("nn").cast("long").as("n"), col("rr").cast("long").as("n_returned"),
      round(tStat, 6).as("ca_t"),
      round(tStat / sqrt(varT), 6).as("ca_z"))
  }
  private val q172Sql =
    """WITH byl AS (
      |  SELECT CAST(FLOOR((l_quantity - 1) / 10) AS BIGINT) + 1 AS t,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS r
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_levels,
      |    SUM(CAST(n AS DECIMAL(38,0))) AS nn,
      |    SUM(CAST(r AS DECIMAL(38,0))) AS rr,
      |    SUM(CAST(t * n AS DECIMAL(38,0))) AS stn,
      |    SUM(CAST(t * r AS DECIMAL(38,0))) AS str,
      |    SUM(CAST(t * t * n AS DECIMAL(38,0))) AS st2n
      |  FROM byl)
      |SELECT n_levels, CAST(nn AS BIGINT) AS n, CAST(rr AS BIGINT) AS n_returned,
      |  ROUND(CAST(str AS DOUBLE)
      |    - (CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) * CAST(stn AS DOUBLE), 6) AS ca_t,
      |  ROUND((CAST(str AS DOUBLE)
      |      - (CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) * CAST(stn AS DOUBLE))
      |    / SQRT((CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
      |      * (1 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
      |      * (CAST(st2n AS DOUBLE)
      |        - CAST(stn AS DOUBLE) * CAST(stn AS DOUBLE) / CAST(nn AS DOUBLE))), 6)
      |    AS ca_z
      |FROM tot""".stripMargin

  /** q173: KENDALL'S τ-b per nation between monthly order count and
    * monthly revenue — the rank-concordance complement of q155's
    * Spearman (τ counts PAIRWISE order inversions, so it is robust
    * to the monotone-transform family and has a direct
    * probability-of-concordance reading). The pairwise self-join is
    * CALENDAR-BOUNDED (months per nation ≤ the date span, ~84 here —
    * q170's bounded-pair argument: the quadratic is in the GROUP
    * size, which does not grow with data volume; a per-row pairwise
    * τ would be dispatch-guarded instead). Concordance tests compare
    * an exact integer count x and an exact DECIMAL(28,2) revenue y,
    * so tie classification is bit-identical across engines; C/D/tie
    * counts are integers and τ-b = (C−D)/√((n₀−tx)(n₀−ty)) is one
    * fixed IEEE expression. Exact, hash-checked. */
  private val q173: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val pm = Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      // revenue folds as CAST(expr AS DECIMAL(28,6)) — never
      // ROUND(expr, 2): 2-dp rounding of ~4-decimal products hits
      // .xx5 half-cases where the engines' double rounding disagrees
      // by a cent; the 6-dp cast of identical doubles agrees (the
      // dsum discipline)
      .agg(countDistinct(col("o_orderkey")).as("x"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec6)).as("y"))
    val a = pm.select(col("nation"), col("month").as("ma"),
      col("x").as("xa"), col("y").as("ya"))
    val b = pm.select(col("nation"), col("month").as("mb"),
      col("x").as("xb"), col("y").as("yb"))
    val pairs = a.join(b, Seq("nation")).filter(col("ma") < col("mb"))
    val agg = pairs.groupBy("nation").agg(
      count(lit(1)).as("n0"),
      count(when((col("xa") < col("xb") && col("ya") < col("yb")) ||
        (col("xa") > col("xb") && col("ya") > col("yb")), 1)).as("c"),
      count(when((col("xa") < col("xb") && col("ya") > col("yb")) ||
        (col("xa") > col("xb") && col("ya") < col("yb")), 1)).as("dd"),
      count(when(col("xa") === col("xb"), 1)).as("tx"),
      count(when(col("ya") === col("yb"), 1)).as("ty"))
    val m = pm.groupBy("nation").agg(count(lit(1)).as("n_months"))
    m.join(agg, Seq("nation"))
      .select(col("nation"), col("n_months"),
        col("c").as("concordant"), col("dd").as("discordant"),
        round((col("c") - col("dd")).cast("double") /
          sqrt((col("n0") - col("tx")).cast("double") *
            (col("n0") - col("ty")).cast("double")), 6).as("tau_b"))
  }
  private val q173Sql =
    """WITH pm AS (
      |  SELECT n_name AS nation, strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS x,
      |    SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,6))) AS y
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.nation,
      |    CAST(COUNT(*) AS BIGINT) AS n0,
      |    CAST(COUNT(CASE WHEN (a.x < b.x AND a.y < b.y)
      |      OR (a.x > b.x AND a.y > b.y) THEN 1 END) AS BIGINT) AS c,
      |    CAST(COUNT(CASE WHEN (a.x < b.x AND a.y > b.y)
      |      OR (a.x > b.x AND a.y < b.y) THEN 1 END) AS BIGINT) AS dd,
      |    CAST(COUNT(CASE WHEN a.x = b.x THEN 1 END) AS BIGINT) AS tx,
      |    CAST(COUNT(CASE WHEN a.y = b.y THEN 1 END) AS BIGINT) AS ty
      |  FROM pm a JOIN pm b ON a.nation = b.nation AND a.month < b.month
      |  GROUP BY 1),
      |m AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_months
      |  FROM pm GROUP BY 1)
      |SELECT m.nation, m.n_months, c AS concordant, dd AS discordant,
      |  ROUND(CAST(c - dd AS DOUBLE)
      |    / SQRT(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)), 6)
      |    AS tau_b
      |FROM m JOIN pairs ON pairs.nation = m.nation""".stripMargin

  /** q174: PEAK CONCURRENT OPEN ORDERS — interval-stabbing via the
    * classic boundary-delta trick: each order is an interval
    * [o_orderdate, max(l_shipdate)], emits +1 at its start day and −1
    * the day AFTER its end, and the open count is the running sum of
    * per-day deltas. The step function only changes at boundary days,
    * so ranking event days by count ranks ALL days (any non-event
    * day's count equals the latest event day's). Scale shape: the
    * interval build is one per-order aggregate (max over the order's
    * lines, map-side partial), the delta table collapses to
    * CALENDAR-sized rows (one per distinct day — thousands,
    * regardless of data volume), and only that day-grain table runs
    * through the running-sum window (the q07/q28 documented day-grain
    * shape) before a top-20. Exact integer counts, hash-checked. */
  private val q174: QFn = (s, d) => {
    val spans = Tables.lineitem(s, d)
      .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("end_ts"))
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
    val deltas = spans
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        lit(1L).as("dlt"))
      .union(spans.select(
        date_format(date_add(to_date(col("end_ts")), 1), "yyyy-MM-dd")
          .as("day"),
        lit(-1L).as("dlt")))
      .groupBy("day").agg(sum(col("dlt")).as("dlt"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("open_orders", sum(col("dlt")).over(w))
      .select("day", "open_orders")
      .orderBy(col("open_orders").desc, col("day").asc)
      .limit(20)
  }
  private val q174Sql =
    """WITH spans AS (
      |  SELECT o_orderdate, CAST(MAX(l_shipdate) AS DATE) AS end_d
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_orderkey, o_orderdate),
      |deltas AS (
      |  SELECT day, CAST(SUM(dlt) AS BIGINT) AS dlt FROM (
      |    SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, 1 AS dlt
      |    FROM spans
      |    UNION ALL
      |    SELECT strftime(end_d + 1, '%Y-%m-%d') AS day, -1 AS dlt
      |    FROM spans) u
      |  GROUP BY 1)
      |SELECT day,
      |  CAST(SUM(dlt) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS open_orders
      |FROM deltas
      |ORDER BY open_orders DESC, day ASC
      |LIMIT 20""".stripMargin

  /** q175: WALD–WOLFOWITZ RUNS TEST on the daily order-count series —
    * are above-mean and below-mean days RANDOMLY interleaved, or do
    * they clump (trend/regime) or alternate (overcorrection)? The
    * nonparametric randomness screen that complements q135's
    * parametric autocorrelation. Sign classification is INTEGER-exact
    * (c·D vs N in int64 — never a float mean comparison; exact-mean
    * days drop, the standard treatment), the run count is a lag over
    * the CALENDAR-sized day-grain table (the q174 documented shape),
    * and E[R] = 1 + 2n₁n₂/n, Var R, z are ONE fixed IEEE expression
    * over exact integer counts. Exact, hash-checked. */
  private val q175: QFn = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("c"))
    val tot = daily.agg(sum(col("c")).as("nn"), count(lit(1)).as("dd"))
    val signed = daily.crossJoin(broadcast(tot))
      .filter(col("c") * col("dd") =!= col("nn"))
      .select(col("day"),
        (col("c") * col("dd") > col("nn")).cast("int").as("sgn"))
    val w = Window.orderBy("day")
    val agg = signed
      .withColumn("prev", lag(col("sgn"), 1).over(w))
      .agg(
        count(when(col("prev").isNull || col("prev") =!= col("sgn"), 1))
          .as("runs"),
        sum(col("sgn")).as("n1"),
        count(when(col("sgn") === 0, 1)).as("n2"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val n = n1 + n2
    val er = lit(1.0) + lit(2.0) * n1 * n2 / n
    val vr = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n) /
      (n * n * (n - lit(1.0)))
    agg.select(col("n1"), col("n2"), col("runs"),
      round(er, 6).as("expected_runs"),
      round((col("runs").cast("double") - er) / sqrt(vr), 6).as("z"))
  }
  private val q175Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
      |  CAST(COUNT(*) AS BIGINT) AS dd FROM daily),
      |signed AS (
      |  SELECT day, CAST(c * dd > nn AS INT) AS sgn
      |  FROM daily, tot WHERE c * dd <> nn),
      |lagged AS (
      |  SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev FROM signed),
      |agg AS (
      |  SELECT CAST(COUNT(CASE WHEN prev IS NULL OR prev <> sgn
      |      THEN 1 END) AS BIGINT) AS runs,
      |    CAST(SUM(sgn) AS BIGINT) AS n1,
      |    CAST(COUNT(CASE WHEN sgn = 0 THEN 1 END) AS BIGINT) AS n2
      |  FROM lagged)
      |SELECT n1, n2, runs,
      |  ROUND(1.0 + 2.0 * n1 * n2 / (n1 + n2), 6) AS expected_runs,
      |  ROUND((CAST(runs AS DOUBLE) - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
      |    / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
      |      / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6) AS z
      |FROM agg""".stripMargin

  /** q176: THEIL–SEN ROBUST SLOPE of monthly revenue per nation — the
    * median of all pairwise month-to-month slopes (Sen 1968), the
    * outlier-proof complement to q169's least-squares fit (one crazy
    * month moves OLS, not the pairwise median). Scale shape: the fact
    * reduces FIRST to (nation, month) decimal revenue, the pairwise
    * self-join is CALENDAR-BOUNDED (the q173 argument — months², not
    * data volume), each slope is exact-decimal Δy over integer Δt
    * rounded once at 6 dp, and the median is the k-th order statistic
    * (k = ⌈n₀/2⌉, lower median — tie-safe: the k-th value under a
    * value sort is well-defined regardless of tie order) via a
    * nation-partitioned rank. Exact, hash-checked. */
  private val q176: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val pm = Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("t"))
      // 6-dp decimal cast, never 2-dp round (see q173's note)
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(dec6)).as("y"))
    val a = pm.select(col("nation"), col("t").as("ta"), col("y").as("ya"))
    val b = pm.select(col("nation"), col("t").as("tb"), col("y").as("yb"))
    // rank on the RAW IEEE slope — one division over bit-identical
    // exact inputs is bit-identical across engines, so the k-th
    // element matches; rounding 77k slopes BEFORE selection would let
    // a single engine-rounding disagreement shift the median element
    val slopes = a.join(b, Seq("nation")).filter(col("ta") < col("tb"))
      .select(col("nation"),
        ((col("yb") - col("ya")).cast("double") /
          (col("tb") - col("ta")).cast("double")).as("slope"))
    val n0 = slopes.groupBy("nation").agg(count(lit(1)).as("n_pairs"))
    val w = Window.partitionBy("nation").orderBy("slope")
    slopes.withColumn("rk", row_number().over(w))
      .join(n0, Seq("nation"))
      // integer div (Column./ on longs is TRUE division → double)
      .filter(col("rk") === expr("(n_pairs + 1) div 2"))
      .select(col("nation"), col("n_pairs"),
        round(col("slope"), 6).as("sen_slope"))
  }
  private val q176Sql =
    """WITH pm AS (
      |  SELECT n_name AS nation,
      |    CAST(EXTRACT(YEAR FROM o_orderdate) * 12
      |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS t,
      |    SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,6))) AS y
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |slopes AS (
      |  SELECT a.nation,
      |    CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
      |  FROM pm a JOIN pm b ON a.nation = b.nation AND a.t < b.t),
      |n0 AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM slopes GROUP BY 1),
      |rk AS (
      |  SELECT nation, slope,
      |    ROW_NUMBER() OVER (PARTITION BY nation ORDER BY slope) AS rk
      |  FROM slopes)
      |SELECT rk.nation, n_pairs, ROUND(slope, 6) AS sen_slope
      |FROM rk JOIN n0 ON n0.nation = rk.nation
      |WHERE rk = (n_pairs + 1) // 2""".stripMargin

  /** q178: RECORD-BREAKING DAYS per year — how many days set a new
    * all-time daily-revenue high (for a stationary series the expected
    * count decays as ~1/t; a flat-or-rising record rate = growth or
    * drift — the "records" nonparametric trend screen, complementing
    * q175's runs test and q148's CUSUM). The fact reduces FIRST to the
    * day-grain exact-decimal series; the prior-peak is a running max
    * over the CALENDAR-sized table (the q174 documented shape), record
    * classification compares exact decimals, and the per-year rollup
    * is a tiny grouped count. Exact, hash-checked. */
  private val q178: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      // 6-dp decimal cast, never 2-dp round (see q173's note)
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(dec6)).as("rev"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    daily.withColumn("prevmax", max(col("rev")).over(w))
      .groupBy(year(col("day")).as("yr"))
      .agg(count(lit(1)).as("days"),
        count(when(col("prevmax").isNull || col("rev") > col("prevmax"), 1))
          .as("record_days"))
      .select(col("yr").cast("long").as("yr"), col("days"),
        col("record_days"))
  }
  private val q178Sql =
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |    SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,6))) AS rev
      |  FROM lineitem GROUP BY 1),
      |rec AS (
      |  SELECT day, rev, MAX(rev) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM daily)
      |SELECT CAST(EXTRACT(YEAR FROM day) AS BIGINT) AS yr,
      |  CAST(COUNT(*) AS BIGINT) AS days,
      |  CAST(COUNT(CASE WHEN prevmax IS NULL OR rev > prevmax THEN 1 END)
      |    AS BIGINT) AS record_days
      |FROM rec GROUP BY 1""".stripMargin

  /** q180: GUMBEL FIT OF MONTHLY PEAK DAILY REVENUE — extreme-value
    * theory's block-maxima method (Gumbel 1958; the EVT complement to
    * q150's log-normal body fit): the max daily revenue within each
    * month block follows a Gumbel law for light-tailed daily sums,
    * and the method-of-moments fit β̂ = σ√6/π, μ̂ = x̄ − γβ̂ is the
    * capacity-planning number ("what peak should next month expect").
    * Scale shape: the fact reduces to the day-grain exact-decimal
    * series (map-side partials), block maxima are ONE tiny grouped
    * max (decimal-exact), and the moment sums over the BLOCK-COUNT-
    * sized maxima fold as exact decimals — Σx at (28,6), Σx² via a
    * (18,6)×(18,6) → (37,12) decimal product, EXACT in both engines
    * (never a rounded double square); μ̂/β̂ one fixed IEEE expression.
    * Exact, hash-checked. */
  private val q180: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 6)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 12)
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(dec6)).as("rev"))
    val maxima = daily
      .groupBy((year(col("day")) * 12 + month(col("day"))).as("blk"))
      .agg(max(col("rev")).cast(dec18).as("x"))
    val t = maxima.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec6)).as("sx"),
      sum((col("x") * col("x")).cast(dec38)).as("sxx"))
    val nD = col("n").cast("double")
    val mean = col("sx").cast("double") / nD
    val variance = (col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD) /
      (nD - lit(1.0))
    val beta = sqrt(variance * lit(6.0)) / lit(math.Pi)
    t.select(col("n").as("n_blocks"),
      round(mean, 6).as("mean_max"),
      round(beta, 6).as("gumbel_beta"),
      round(mean - lit(0.5772156649015329) * beta, 6).as("gumbel_mu"))
  }
  private val q180Sql =
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |    SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,6))) AS rev
      |  FROM lineitem GROUP BY 1),
      |maxima AS (
      |  SELECT EXTRACT(YEAR FROM day) * 12 + EXTRACT(MONTH FROM day)
      |      AS blk,
      |    CAST(MAX(rev) AS DECIMAL(19,6)) AS x
      |  FROM daily GROUP BY 1),
      |t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(28,6))) AS sx,
      |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
      |  FROM maxima)
      |SELECT n AS n_blocks,
      |  ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_max,
      |  ROUND(SQRT(((CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1.0))
      |    * 6.0) / PI(), 6) AS gumbel_beta,
      |  ROUND(CAST(sx AS DOUBLE) / n - 0.5772156649015329
      |    * (SQRT(((CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1.0))
      |    * 6.0) / PI()), 6) AS gumbel_mu
      |FROM t""".stripMargin

  /** q183: SUPPLIER PRICE DISPERSION per part — the coefficient of
    * variation of per-supplier unit prices (commodity parts price
    * tightly, differentiated or gamed parts spread; the procurement
    * "is this part worth re-bidding" screen). Scale shape: ONE
    * fact-sized (part, supplier) aggregate with map-side partials —
    * unit price = exact-decimal Σ price / Σ qty, ONE IEEE division
    * rounded at 6 dp (arbitrary-mantissa ratios never sit on 6-dp
    * half-boundaries, unlike 2-dp money — the q173 lesson) — then
    * supplier-count-sized decimal moments per part (6-dp terms,
    * (37,12)-exact squares, the q164 discipline), k ≥ 3 floor,
    * top-20 by CV with part tiebreak. Exact, hash-checked. */
  private val q183: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 12)
    val usp = Tables.lineitem(s, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_extendedprice").cast(dec6)).as("sp"),
        sum(col("l_quantity").cast(dec6)).as("sq"))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("sp").cast("double") / col("sq").cast("double"), 6)
          .as("up"))
    val m = usp.groupBy("l_partkey").agg(
      count(lit(1)).as("n_suppliers"),
      sum(col("up").cast(dec6)).as("su"),
      sum((col("up").cast(org.apache.spark.sql.types.DecimalType(18, 6)) *
        col("up").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast(dec38)).as("suu"))
      .filter(col("n_suppliers") >= 3)
    val nD = col("n_suppliers").cast("double")
    val mean = col("su").cast("double") / nD
    val variance = (col("suu").cast("double") -
      col("su").cast("double") * col("su").cast("double") / nD) /
      (nD - lit(1.0))
    m.select(col("l_partkey").as("partkey"), col("n_suppliers"),
      round(mean, 6).as("mean_unit_price"),
      round(sqrt(variance) / mean, 6).as("cv"))
      .orderBy(col("cv").desc, col("partkey").asc)
      .limit(20)
  }
  private val q183Sql =
    """WITH usp AS (
      |  SELECT l_partkey, l_suppkey,
      |    ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
      |        AS DOUBLE)
      |      / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 6)
      |      AS up
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT l_partkey AS partkey,
      |    CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      |    SUM(CAST(up AS DECIMAL(28,6))) AS su,
      |    SUM(CAST(CAST(up AS DECIMAL(19,6)) * CAST(up AS DECIMAL(19,6))
      |      AS DECIMAL(38,12))) AS suu
      |  FROM usp GROUP BY 1 HAVING COUNT(*) >= 3)
      |SELECT partkey, n_suppliers,
      |  ROUND(CAST(su AS DOUBLE) / n_suppliers, 6) AS mean_unit_price,
      |  ROUND(SQRT((CAST(suu AS DOUBLE)
      |      - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) / n_suppliers)
      |    / (n_suppliers - 1.0))
      |    / (CAST(su AS DOUBLE) / n_suppliers), 6) AS cv
      |FROM m
      |ORDER BY cv DESC, partkey ASC
      |LIMIT 20""".stripMargin

  /** q184: PAIRED SIGN TEST — did per-customer order value RISE from
    * 1996 to 1997? Each both-years customer contributes one sign
    * (exact DECIMAL comparison of the two yearly sums — ties drop,
    * the standard treatment), and under H₀ the positives are
    * Binomial(n, ½): z = (n₊ − n/2)/√(n/4). The PAIRED complement to
    * q136's two-sample Welch (each customer is their own control, so
    * between-customer variance cancels). One fact-sized (customer,
    * year) aggregate, one customer-sized pivot join, one tiny count;
    * z one fixed IEEE expression over exact integers. Exact,
    * hash-checked. */
  private val q184: QFn = (s, d) => {
    val yearly = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(sum(col("o_totalprice").cast(Dec)).as("v"))
    val a = yearly.filter(col("yr") === 1996)
      .select(col("o_custkey"), col("v").as("v96"))
    val b = yearly.filter(col("yr") === 1997)
      .select(col("o_custkey"), col("v").as("v97"))
    val t = a.join(b, Seq("o_custkey"))
      .filter(col("v97") =!= col("v96"))
      .agg(count(lit(1)).as("n"),
        count(when(col("v97") > col("v96"), 1)).as("n_up"))
    val nD = col("n").cast("double")
    t.select(col("n").as("n_customers"), col("n_up"),
      round(col("n_up").cast("double") / nD, 6).as("frac_up"),
      round((col("n_up").cast("double") - nD / 2) / sqrt(nD / 4), 6)
        .as("sign_z"))
  }
  private val q184Sql =
    """WITH yearly AS (
      |  SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS v
      |  FROM orders
      |  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
      |  GROUP BY 1, 2),
      |t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(CASE WHEN b.v > a.v THEN 1 END) AS BIGINT) AS n_up
      |  FROM yearly a JOIN yearly b
      |    ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1997
      |  WHERE a.v <> b.v)
      |SELECT n AS n_customers, n_up,
      |  ROUND(CAST(n_up AS DOUBLE) / n, 6) AS frac_up,
      |  ROUND((CAST(n_up AS DOUBLE) - CAST(n AS DOUBLE) / 2)
      |    / SQRT(CAST(n AS DOUBLE) / 4), 6) AS sign_z
      |FROM t""".stripMargin

  /** q185: PER-BRAND PRICE ELASTICITY — q169's log-log OLS GROUPED by
    * brand: slope of ln(price) on ln(quantity) per brand plus R²,
    * the "which product lines discount by volume" sweep. The grouped
    * form changes nothing about the scale shape: per-row 6-dp ln
    * (deterministic scalar IEEE), all five moments fold map-side as
    * exact decimals PER GROUP in ONE aggregate, closed-form fits
    * fixed IEEE over brand-count rows. Exact, hash-checked. */
  private val q185: QFn = (s, d) => {
    val dec = Dec
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 12)
    val pts = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .select(col("p_brand").as("brand"),
        round(log(col("l_quantity")), 6).as("x"),
        round(log(col("l_extendedprice")), 6).as("y"))
    val m = pts.groupBy("brand").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum(round(col("x") * col("y"), 6).cast(dec38)).as("sxy"),
      sum(round(col("x") * col("x"), 6).cast(dec38)).as("sxx"),
      sum(round(col("y") * col("y"), 6).cast(dec38)).as("syy"))
    val nD = col("n").cast("double")
    val cxy = col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / nD
    val cxx = col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD
    val cyy = col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / nD
    m.select(col("brand"), col("n"),
      round(cxy / cxx, 6).as("elasticity"),
      round((col("sy").cast("double") -
        (cxy / cxx) * col("sx").cast("double")) / nD, 6).as("intercept"),
      round(cxy * cxy / (cxx * cyy), 6).as("r2"))
  }
  private val q185Sql =
    """WITH pts AS (
      |  SELECT p_brand AS brand,
      |    ROUND(ln(l_quantity), 6) AS x,
      |    ROUND(ln(l_extendedprice), 6) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_quantity > 0 AND l_extendedprice > 0),
      |m AS (
      |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(28,6))) AS sx,
      |    SUM(CAST(y AS DECIMAL(28,6))) AS sy,
      |    SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,12))) AS sxy,
      |    SUM(CAST(ROUND(x * x, 6) AS DECIMAL(38,12))) AS sxx,
      |    SUM(CAST(ROUND(y * y, 6) AS DECIMAL(38,12))) AS syy
      |  FROM pts GROUP BY 1)
      |SELECT brand, n,
      |  ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
      |    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n), 6)
      |    AS elasticity,
      |  ROUND((CAST(sy AS DOUBLE)
      |    - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
      |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n))
      |      * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
      |  ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
      |    * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
      |    / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
      |      * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 6)
      |    AS r2
      |FROM m""".stripMargin

  /** Shared one-way ANOVA F machinery over (g, z) rows with z an
    * EXACT decimal: per-group Σz/Σz²/n in ONE map-side-partial
    * aggregate (squares via the width-safe (18,6)² → (37,12) decimal
    * product — exact in both engines), then the K-group folds
    * Σ S_g²/n_g ride 12-dp-rounded terms through the exact decimal
    * accumulator (the q151 discipline — a plain double sum over
    * groups would be order-dependent), F one fixed IEEE expression.
    * Columns out: k, n, f_stat. */
  private def anovaF(zByG: DataFrame): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 6)
    val dec37 = org.apache.spark.sql.types.DecimalType(38, 12)
    val g = zByG.groupBy("g").agg(
      count(lit(1)).as("ng"),
      sum(col("z").cast(dec6)).as("sg"),
      sum((col("z").cast(dec18) * col("z").cast(dec18)).cast(dec37))
        .as("sgg"))
    val term = round(col("sg").cast("double") * col("sg").cast("double") /
      col("ng").cast("double"), 12)
    val t = g.agg(count(lit(1)).as("k"),
      sum(col("ng")).as("n"),
      sum(col("sg")).as("s"),
      sum(col("sgg")).as("ss"),
      sum(term.cast(dec37)).as("sb"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("sb").cast("double") -
      col("s").cast("double") * col("s").cast("double") / nD
    val ssw = col("ss").cast("double") - col("sb").cast("double")
    t.select(col("k"), col("n"),
      round((ssb / (kD - 1)) / (ssw / (nD - kD)), 6).as("f_stat"))
  }

  /** The DuckDB mirror of [[anovaF]] given a `zg(g, z)` CTE. */
  private def anovaFSql(prefix: String): String = prefix +
    """,
      |gr AS (
      |  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
      |    SUM(CAST(z AS DECIMAL(28,6))) AS sg,
      |    SUM(CAST(CAST(z AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6))
      |      AS DECIMAL(38,12))) AS sgg
      |  FROM zg GROUP BY 1),
      |t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |    CAST(SUM(ng) AS BIGINT) AS n,
      |    SUM(sg) AS s, SUM(sgg) AS ss,
      |    SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng, 12)
      |      AS DECIMAL(38,12))) AS sb
      |  FROM gr)
      |SELECT k, n,
      |  ROUND(((CAST(sb AS DOUBLE)
      |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (k - 1.0))
      |    / ((CAST(ss AS DOUBLE) - CAST(sb AS DOUBLE)) / (n - k)), 6)
      |    AS f_stat
      |FROM t""".stripMargin

  /** q186: ONE-WAY ANOVA F across market segments on order value —
    * the parametric twin of q144's Kruskal–Wallis (same question,
    * mean-based instead of rank-based; read together they separate
    * "means differ" from "distributions differ"). Money enters as
    * exact DECIMAL; see [[anovaF]] for the fold discipline. Exact,
    * hash-checked. */
  private val q186: QFn = (s, d) => {
    val base = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"),
        col("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(28, 6)).as("z"))
    anovaF(base)
  }
  private val q186Sql = anovaFSql(
    """WITH zg AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(o_totalprice AS DECIMAL(28,6)) AS z
      |  FROM orders JOIN customer ON o_custkey = c_custkey)""".stripMargin)

  /** q187: BROWN–FORSYTHE variance-homogeneity test — q186's ANOVA F
    * applied to |x − median_g| (Brown & Forsythe 1974, the
    * median-centered Levene: robust to non-normality): do the
    * SEGMENTS' SPREADS differ, the assumption q186/q136 lean on? The
    * group median is the weighted-median machinery of q163 — per-
    * distinct-value counts, cumulative weight as a DISTRIBUTED
    * grouped prefix sum, INTEGER-exact 2·(cum+c) ≥ n selection —
    * then |x − med| is an exact decimal difference and the F fold is
    * [[anovaF]]. Exact, hash-checked. */
  private val q187: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val base = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"),
        col("o_totalprice").cast(dec6).as("x"))
    val pv = base.groupBy("g", "x").agg(count(lit(1)).as("c"))
    val cum = RankOps.withGroupedPrefixSum(pv, Seq("g"), Seq("x"),
      valueCol = "c", sumCol = "cumBefore")
    val tot = base.groupBy("g").agg(count(lit(1)).as("n"))
    val med = cum.join(tot, Seq("g"))
      .filter(lit(2) * (col("cumBefore") + col("c")) >= col("n"))
      .groupBy("g").agg(min(col("x")).as("med"))
    anovaF(base.join(med, Seq("g"))
      .select(col("g"), abs(col("x") - col("med")).as("z")))
  }
  private val q187Sql = anovaFSql(
    """WITH base AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(o_totalprice AS DECIMAL(28,6)) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |pv AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM base GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, x, c,
      |    COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cumBefore
      |  FROM pv),
      |tot AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1),
      |med AS (
      |  SELECT cum.g, MIN(x) AS med
      |  FROM cum JOIN tot ON tot.g = cum.g
      |  WHERE 2 * (cumBefore + c) >= n GROUP BY 1),
      |zg AS (
      |  SELECT base.g, ABS(x - med) AS z
      |  FROM base JOIN med ON med.g = base.g)""".stripMargin)

  /** q188: POISSON OVERDISPERSION of daily order counts — the
    * index of dispersion D = s²/x̄ (D ≈ 1 for a Poisson arrival
    * process, D ≫ 1 = clumped demand; the "is a Poisson model even
    * admissible" gate before any queueing math), with the classic
    * chi-square form (n−1)·D. Day-grain integer counts, Σc/Σc²
    * INTEGER-exact in decimal(38), D and (n−1)D one fixed IEEE
    * expression. Exact, hash-checked. */
  private val q188: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("c"))
    val t = daily.agg(count(lit(1)).as("n"),
      sum(col("c").cast(dec38)).as("sc"),
      sum((col("c") * col("c")).cast(dec38)).as("scc"))
    val nD = col("n").cast("double")
    val mean = col("sc").cast("double") / nD
    val variance = (col("scc").cast("double") -
      col("sc").cast("double") * col("sc").cast("double") / nD) /
      (nD - lit(1.0))
    t.select(col("n").as("n_days"),
      round(mean, 6).as("mean_daily"),
      round(variance, 6).as("var_daily"),
      round(variance / mean, 6).as("dispersion"),
      round((nD - 1) * variance / mean, 6).as("chi2"))
  }
  private val q188Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(c AS DECIMAL(38,0))) AS sc,
      |    SUM(CAST(c * c AS DECIMAL(38,0))) AS scc
      |  FROM daily)
      |SELECT n AS n_days,
      |  ROUND(CAST(sc AS DOUBLE) / n, 6) AS mean_daily,
      |  ROUND((CAST(scc AS DOUBLE)
      |    - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1.0), 6)
      |    AS var_daily,
      |  ROUND(((CAST(scc AS DOUBLE)
      |    - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1.0))
      |    / (CAST(sc AS DOUBLE) / n), 6) AS dispersion,
      |  ROUND((n - 1.0) * ((CAST(scc AS DOUBLE)
      |    - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1.0))
      |    / (CAST(sc AS DOUBLE) / n), 6) AS chi2
      |FROM t""".stripMargin

  /** q189: NEGATIVE-BINOMIAL FIT of per-customer order counts —
    * method-of-moments r̂ = m²/(s²−m), p̂ = m/s² (the standard
    * heterogeneous-demand model: NB = Poisson with gamma-distributed
    * customer rates; r̂ is the heterogeneity dial marketing's
    * buy-till-you-die models start from). One fact-sized customer
    * aggregate, INTEGER-exact Σc/Σc², estimates one fixed IEEE
    * expression. Exact, hash-checked. */
  private val q189: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val per = Tables.orders(s, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("c"))
    val t = per.agg(count(lit(1)).as("n"),
      sum(col("c").cast(dec38)).as("sc"),
      sum((col("c") * col("c")).cast(dec38)).as("scc"))
    val nD = col("n").cast("double")
    val mean = col("sc").cast("double") / nD
    val variance = (col("scc").cast("double") -
      col("sc").cast("double") * col("sc").cast("double") / nD) /
      (nD - lit(1.0))
    t.select(col("n").as("n_customers"),
      round(mean, 6).as("mean_orders"),
      round(variance, 6).as("var_orders"),
      round(mean * mean / (variance - mean), 6).as("nb_r"),
      round(mean / variance, 6).as("nb_p"))
  }
  private val q189Sql =
    """WITH per AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(c AS DECIMAL(38,0))) AS sc,
      |    SUM(CAST(c * c AS DECIMAL(38,0))) AS scc
      |  FROM per)
      |SELECT n AS n_customers,
      |  ROUND(CAST(sc AS DOUBLE) / n, 6) AS mean_orders,
      |  ROUND((CAST(scc AS DOUBLE)
      |    - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1.0), 6)
      |    AS var_orders,
      |  ROUND((CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)
      |    / (((CAST(scc AS DOUBLE)
      |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1.0))
      |      - CAST(sc AS DOUBLE) / n), 6) AS nb_r,
      |  ROUND((CAST(sc AS DOUBLE) / n)
      |    / ((CAST(scc AS DOUBLE)
      |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1.0)), 6)
      |    AS nb_p
      |FROM t""".stripMargin

  /** q193: JARQUE–BERA NORMALITY TEST of order value per market
    * segment — JB = n/6·(S² + K²/4) from the sample skewness and
    * excess kurtosis (Jarque & Bera 1980): the gate on the normality
    * assumption q186's F and q136's t lean on, completing the
    * segment-distribution triptych (means q186, spreads q187, SHAPE
    * here). Same two-pass centered-moment discipline as q164 —
    * never raw Σx⁴ — with JB one fixed IEEE expression over the
    * moment ratios. Exact, hash-checked. */
  private val q193: QFn = (s, d) => {
    val BigDec = org.apache.spark.sql.types.DecimalType(38, 6)
    val o = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("o_totalprice").as("x"))
    val mu = o.groupBy("g")
      .agg(round(graft.util.Exact.davg(col("x")), 6).as("mu"),
        count(lit(1)).as("n"))
    val dd = col("x") - col("mu")
    val m = o.join(broadcast(mu), Seq("g"))
      .select(col("g"), col("n"),
        round(dd * dd, 6).as("d2"),
        round(dd * dd * dd, 6).as("d3"),
        round(dd * dd * dd * dd, 6).as("d4"))
      .groupBy("g")
      .agg(first(col("n")).as("n"),
        sum(col("d2").cast(Dec)).cast("double").as("m2s"),
        sum(col("d3").cast(BigDec)).cast("double").as("m3s"),
        sum(col("d4").cast(BigDec)).cast("double").as("m4s"))
    val nD = col("n").cast("double")
    val sk = (col("m3s") / nD) / pow(col("m2s") / nD, lit(1.5))
    val ku = (col("m4s") / nD) /
      ((col("m2s") / nD) * (col("m2s") / nD)) - lit(3.0)
    m.select(col("g").as("segment"), col("n"),
      round(sk, 6).as("skewness"),
      round(ku, 6).as("excess_kurtosis"),
      round(nD / 6 * (sk * sk + ku * ku / 4), 6).as("jb_stat"))
  }
  private val q193Sql =
    s"""WITH base AS (
       |  SELECT c_mktsegment AS g, o_totalprice AS x
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |mu AS (
       |  SELECT g, ROUND(${graft.util.Exact.sqlAvg("x")}, 6) AS mu,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM base GROUP BY 1),
       |ctr AS (
       |  SELECT base.g, n,
       |    ROUND((x - mu) * (x - mu), 6) AS d2,
       |    ROUND((x - mu) * (x - mu) * (x - mu), 6) AS d3,
       |    ROUND((x - mu) * (x - mu) * (x - mu) * (x - mu), 6) AS d4
       |  FROM base JOIN mu ON mu.g = base.g),
       |m AS (
       |  SELECT g, MIN(n) AS n,
       |    CAST(SUM(CAST(d2 AS DECIMAL(28,6))) AS DOUBLE) AS m2s,
       |    CAST(SUM(CAST(d3 AS DECIMAL(38,6))) AS DOUBLE) AS m3s,
       |    CAST(SUM(CAST(d4 AS DECIMAL(38,6))) AS DOUBLE) AS m4s
       |  FROM ctr GROUP BY 1)
       |SELECT g AS segment, n,
       |  ROUND((m3s / n) / POW(m2s / n, 1.5), 6) AS skewness,
       |  ROUND((m4s / n) / ((m2s / n) * (m2s / n)) - 3.0, 6)
       |    AS excess_kurtosis,
       |  ROUND(n / 6.0 * ((m3s / n) / POW(m2s / n, 1.5)
       |      * ((m3s / n) / POW(m2s / n, 1.5))
       |    + ((m4s / n) / ((m2s / n) * (m2s / n)) - 3.0)
       |      * ((m4s / n) / ((m2s / n) * (m2s / n)) - 3.0) / 4.0), 6)
       |    AS jb_stat
       |FROM m""".stripMargin

  /** q197: WEEKLY REVENUE VOLATILITY — the rolling 4-week standard
    * deviation of weekly revenue, top-5 most volatile weeks (the
    * demand-stability screen capacity planning reads next to q180's
    * peak fit and q147's seasonal split). The fact reduces FIRST to
    * the WEEK-grain exact-decimal series (calendar-sized at any
    * volume); the 4-row rolling frame runs over that tiny series (the
    * q174 documented single-partition exception), with Σx and Σx²
    * inside the frame as EXACT decimals (width-safe squares) and the
    * sample std one fixed IEEE expression per row. Exact,
    * hash-checked. */
  private val q197: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val dec18 = org.apache.spark.sql.types.DecimalType(18, 6)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 12)
    val weekly = Tables.lineitem(s, d)
      // FLOOR division, not `div` (truncate-toward-zero): the DuckDB
      // oracle's `//` floors, and the two diverge for shipdates before
      // the 1992-01-01 epoch — pin floor on both sides instead of
      // depending on the dataset's date range (day counts are small,
      // so the double division is exact)
      .groupBy(expr(
        "cast(floor(datediff(to_date(l_shipdate), date'1992-01-01') / 7) " +
          "as bigint)").as("week"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(dec6)).as("rev"))
      .select(col("week"), col("rev").cast(dec18).as("rev"))
    val w = Window.orderBy("week").rowsBetween(-3, 0)
    weekly
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sx", sum(col("rev").cast(dec6)).over(w))
      .withColumn("sxx",
        sum((col("rev") * col("rev")).cast(dec38)).over(w))
      .filter(col("cnt") === 4)
      .select(col("week"),
        round((col("sx").cast("double") / 4), 6).as("mean_rev"),
        round(sqrt((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / 4) / 3), 6)
          .as("rolling_sd"))
      .orderBy(col("rolling_sd").desc, col("week").asc)
      .limit(5)
  }
  private val q197Sql =
    """WITH weekly AS (
      |  SELECT CAST((CAST(l_shipdate AS DATE) - DATE '1992-01-01') // 7
      |      AS BIGINT) AS week,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,6))) AS DECIMAL(19,6)) AS rev
      |  FROM lineitem GROUP BY 1),
      |roll AS (
      |  SELECT week,
      |    COUNT(*) OVER w AS cnt,
      |    SUM(CAST(rev AS DECIMAL(28,6))) OVER w AS sx,
      |    SUM(CAST(rev * rev AS DECIMAL(38,12))) OVER w AS sxx
      |  FROM weekly
      |  WINDOW w AS (ORDER BY week
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
      |SELECT week,
      |  ROUND(CAST(sx AS DOUBLE) / 4, 6) AS mean_rev,
      |  ROUND(SQRT((CAST(sxx AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / 4) / 3), 6)
      |    AS rolling_sd
      |FROM roll WHERE cnt = 4
      |ORDER BY rolling_sd DESC, week ASC
      |LIMIT 5""".stripMargin

  /** q198: INTER-PURCHASE EXPONENTIAL RATE per market segment — the
    * MLE λ̂ = 1/mean-gap of consecutive-order day gaps (the renewal-
    * process rate behind replenishment forecasts; with q189's NB
    * heterogeneity and q188's overdispersion it completes the
    * purchase-process triptych). Gaps are a per-customer lag window
    * (customer-PARTITIONED — partition-parallel at any customer
    * count), integer-exact day differences fold per segment in
    * decimal(38), λ̂/mean one fixed IEEE expression. Exact,
    * hash-checked. */
  private val q198: QFn = (s, d) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("d").asc, col("o_orderkey").asc)
    val gaps = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"))
      .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)))
      .filter(col("gap").isNotNull && col("gap") > 0)
    gaps.join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap").cast(dec38)).as("sg"))
      .select(col("segment"), col("n_gaps"),
        round(col("sg").cast("double") / col("n_gaps").cast("double"), 6)
          .as("mean_gap_days"),
        round(col("n_gaps").cast("double") / col("sg").cast("double"), 6)
          .as("lambda_hat"))
  }
  private val q198Sql =
    """WITH gaps AS (
      |  SELECT o_custkey,
      |    CAST(o_orderdate AS DATE)
      |      - LAG(CAST(o_orderdate AS DATE)) OVER (
      |        PARTITION BY o_custkey
      |        ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS gap
      |  FROM orders),
      |seg AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |    SUM(CAST(gap AS DECIMAL(38,0))) AS sg
      |  FROM gaps JOIN customer ON o_custkey = c_custkey
      |  WHERE gap IS NOT NULL AND gap > 0
      |  GROUP BY 1)
      |SELECT segment, n_gaps,
      |  ROUND(CAST(sg AS DOUBLE) / n_gaps, 6) AS mean_gap_days,
      |  ROUND(n_gaps / CAST(sg AS DOUBLE), 6) AS lambda_hat
      |FROM seg""".stripMargin

  /** q199: RETURN-RATE RANKING BY WILSON LOWER BOUND per brand —
    * the "sort by rating" correction (Wilson 1927; rank by the 95%
    * lower confidence bound, not the raw rate, so a 2/2 brand cannot
    * outrank a 480/500 one): top-10 worst brands by confidently-high
    * return rate, the procurement escalation list. One fact-sized
    * brand aggregate with map-side partials (dims broadcast),
    * integer-exact (returned, total) counts, the Wilson bound
    * ( p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²) ) / (1 + z²/n) one fixed
    * IEEE expression, rate tiebreak then brand. Exact, hash-checked. */
  private val q199: QFn = (s, d) => {
    val z = 1.959963984540054 // two-sided 95%
    val br = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        count(when(col("l_returnflag") === "R", 1)).as("r"))
    val nD = col("n").cast("double")
    val p = col("r").cast("double") / nD
    val z2 = lit(z * z)
    val lower = (p + z2 / (nD * 2) -
      lit(z) * sqrt(p * (lit(1.0) - p) / nD + z2 / (nD * nD * 4))) /
      (lit(1.0) + z2 / nD)
    br.select(col("brand"), col("n"), col("r"),
      round(p, 6).as("return_rate"),
      round(lower, 6).as("wilson_lower"))
      .orderBy(col("wilson_lower").desc, col("brand").asc)
      .limit(10)
  }
  private val q199Sql =
    """WITH br AS (
      |  SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT)
      |      AS r
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1)
      |SELECT brand, n, r,
      |  ROUND(CAST(r AS DOUBLE) / n, 6) AS return_rate,
      |  ROUND((CAST(r AS DOUBLE) / n
      |      + 1.959963984540054 * 1.959963984540054 / (2 * CAST(n AS DOUBLE))
      |      - 1.959963984540054 * SQRT(
      |        (CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
      |          / CAST(n AS DOUBLE)
      |        + 1.959963984540054 * 1.959963984540054
      |          / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      |    / (1.0 + 1.959963984540054 * 1.959963984540054
      |      / CAST(n AS DOUBLE)), 6) AS wilson_lower
      |FROM br
      |ORDER BY wilson_lower DESC, brand ASC
      |LIMIT 10""".stripMargin

  /** q202: NATION TRADE BALANCE — the same dimension joined from two
    * fact paths: supplier-side export revenue (lineitem⋈supplier) vs
    * customer-side demand spend (orders⋈customer), FULL OUTER on the
    * nation, balance and ratio. Scale shape: two independent
    * fact-sized aggregates with every dim broadcast, then a 25-row
    * outer join — the dual-role-dimension pattern (how much does each
    * geography produce vs consume). Revenue folds exact-decimal (the
    * q197 discipline); the ratio is one IEEE divide at 6 dp. */
  private val q202: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val nat = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name").as("nation")))
    val exports = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy("nation")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(dec6)).as("er"))
    val demand = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy("nation")
      .agg(sum(col("o_totalprice").cast(dec6)).as("ds"))
    // Final money columns follow the Exact.dsum discipline: exact
    // decimal sums cast to DOUBLE at the boundary (a DECIMAL(18,6)
    // output stringifies "x.640000" while the oracle's pandas view
    // coerces to float64 "x.64" — the r8 hash-fail class).
    exports.join(demand, Seq("nation"), "full_outer")
      .select(col("nation"),
        coalesce(col("er"), lit(0).cast(dec6)).as("erx"),
        coalesce(col("ds"), lit(0).cast(dec6)).as("dsx"))
      .select(col("nation"),
        col("erx").cast("double").as("export_rev"),
        col("dsx").cast("double").as("demand_spend"),
        (col("erx") - col("dsx")).cast("double").as("balance"),
        when(col("dsx") > 0, round(
          col("erx").cast("double") /
            col("dsx").cast("double"), 6)).as("export_ratio"))
  }
  private val q202Sql =
    """WITH exports AS (
      |  SELECT n_name AS nation,
      |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
      |      AS er
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1),
      |demand AS (
      |  SELECT n_name AS nation,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS ds
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1)
      |SELECT nation,
      |  CAST(COALESCE(er, 0) AS DOUBLE) AS export_rev,
      |  CAST(COALESCE(ds, 0) AS DOUBLE) AS demand_spend,
      |  CAST(COALESCE(er, 0) - COALESCE(ds, 0) AS DOUBLE) AS balance,
      |  CASE WHEN COALESCE(ds, 0) > 0 THEN
      |    ROUND(CAST(COALESCE(er, 0) AS DOUBLE)
      |      / CAST(COALESCE(ds, 0) AS DOUBLE), 6)
      |  END AS export_ratio
      |FROM exports FULL OUTER JOIN demand USING (nation)""".stripMargin

  /** q204: COHEN'S KAPPA per ship year between two binary labelings
    * of line items — "deep discount" (l_discount ≥ 0.05) vs "returned"
    * (l_returnflag = 'R'): chance-corrected agreement, the inter-rater
    * machinery (label-vs-label QA on a 100 TB labeled corpus runs
    * exactly this). One grouped integer-count aggregate (n, both,
    * discount-only, return-only), po/pe/kappa one fixed IEEE
    * expression over exact counts, 6 dp; hash-exact. */
  private val q204: QFn = (s, d) => {
    val li = Tables.lineitem(s, d).select(
      year(to_date(col("l_shipdate"))).as("ship_year"),
      (col("l_discount") >= 0.05).cast("long").as("a"),
      (col("l_returnflag") === "R").cast("long").as("b"))
    val g = li.groupBy("ship_year").agg(
      count(lit(1)).as("n"),
      sum(col("a") * col("b")).as("n11"),
      sum(col("a") * (lit(1L) - col("b"))).as("n10"),
      sum((lit(1L) - col("a")) * col("b")).as("n01"))
    val nD = col("n").cast("double")
    val n00 = col("n") - col("n11") - col("n10") - col("n01")
    val po = (col("n11") + n00).cast("double") / nD
    val pa = (col("n11") + col("n10")).cast("double") / nD
    val pb = (col("n11") + col("n01")).cast("double") / nD
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    g.select(col("ship_year"), col("n"), col("n11"), col("n10"),
      col("n01"),
      round(po, 6).as("p_observed"),
      round(pe, 6).as("p_expected"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6))
        .as("kappa"))
      .orderBy("ship_year")
  }
  private val q204Sql =
    """WITH g AS (
      |  SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)
      |      AS ship_year,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |    CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n10,
      |    CAST(SUM(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n01
      |  FROM lineitem GROUP BY 1)
      |SELECT ship_year, n, n11, n10, n01,
      |  ROUND(CAST(n11 + (n - n11 - n10 - n01) AS DOUBLE)
      |    / CAST(n AS DOUBLE), 6) AS p_observed,
      |  ROUND((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
      |    + (1.0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (1.0 - CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
      |    AS p_expected,
      |  CASE WHEN (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
      |    + (1.0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (1.0 - CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) < 1.0
      |  THEN ROUND(
      |    (CAST(n11 + (n - n11 - n10 - n01) AS DOUBLE) / CAST(n AS DOUBLE)
      |      - ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
      |      + (1.0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (1.0 - CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))))
      |    / (1.0 - ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
      |      + (1.0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (1.0 - CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
      |  END AS kappa
      |FROM g ORDER BY ship_year""".stripMargin

  /** q205: NEW vs RETURNING customers per month — an order is "new"
    * iff its date is its customer's first order date (ties: several
    * same-day firsts all count new, deterministic). The classic
    * growth-accounting split. Scale shape: one customer-keyed min
    * aggregate (key-sized) shuffle-joined back to orders on the same
    * key, one month rollup; counts exact, revenue split exact-decimal,
    * share one IEEE divide at 6 dp. */
  private val q205: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_totalprice"))
    val firstOrd = o.groupBy("o_custkey")
      .agg(min(col("od")).as("first_date"))
    o.join(firstOrd, Seq("o_custkey"))
      .withColumn("is_new", (col("od") === col("first_date")).cast("long"))
      .groupBy(date_format(col("od"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("is_new")).as("n_new"),
        sum(when(col("is_new") === 1L, col("o_totalprice"))
          .otherwise(lit(0)).cast(dec6)).as("nr"),
        sum(when(col("is_new") === 0L, col("o_totalprice"))
          .otherwise(lit(0)).cast(dec6)).as("rr"))
      .select(col("month"), col("n_orders"), col("n_new"),
        round(col("n_new").cast("double") / col("n_orders").cast("double"),
          6).as("new_share"),
        col("nr").cast("double").as("new_rev"),
        col("rr").cast("double").as("returning_rev"))
      .orderBy("month")
  }
  private val q205Sql =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
      |  FROM orders),
      |f AS (SELECT o_custkey, MIN(od) AS first_date FROM o GROUP BY 1),
      |j AS (
      |  SELECT strftime(od, '%Y-%m') AS month,
      |    CASE WHEN od = first_date THEN 1 ELSE 0 END AS is_new,
      |    o_totalprice
      |  FROM o JOIN f USING (o_custkey))
      |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(is_new) AS BIGINT) AS n_new,
      |  ROUND(CAST(SUM(is_new) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
      |    AS new_share,
      |  CAST(SUM(CAST(CASE WHEN is_new = 1 THEN o_totalprice ELSE 0 END
      |    AS DECIMAL(28,6))) AS DOUBLE) AS new_rev,
      |  CAST(SUM(CAST(CASE WHEN is_new = 0 THEN o_totalprice ELSE 0 END
      |    AS DECIMAL(28,6))) AS DOUBLE) AS returning_rev
      |FROM j GROUP BY 1 ORDER BY month""".stripMargin

  /** q206: HILL TAIL-INDEX ESTIMATOR over order values — the
    * continuous-data heavy-tail twin of q195's discrete power-law MLE:
    * H = mean ln(x_(i)/x_(k+1)) over the k = 200 largest totals,
    * alpha = 1/H. Scale shape: a global top-(k+1) is one
    * TakeOrdered (no full sort, no single-reducer window on data);
    * everything after runs on 201 rows. Ties at the cut are
    * value-interchangeable, so the term multiset — and the hash — is
    * deterministic; terms round to 6 dp and fold through the exact
    * decimal accumulator (the q156 discipline). */
  private val q206: QFn = (s, d) => {
    val k = 200
    val top = Tables.orders(s, d)
      .select(col("o_totalprice").cast("double").as("x"))
      .orderBy(col("x").desc).limit(k + 1)
    val w = Window.orderBy(col("x").desc)
    val ranked = top.withColumn("r", row_number().over(w))
    val xref = ranked.filter(col("r") === k + 1)
      .select(col("x").as("x_ref"))
    ranked.filter(col("r") <= k).crossJoin(broadcast(xref))
      .select(col("x_ref"),
        round(log(col("x") / col("x_ref")), 6).as("term"))
      .groupBy("x_ref")
      .agg(count(lit(1)).as("k"),
        sum(col("term").cast(graft.util.Exact.Dec)).as("hsum"))
      .select(col("k"), round(col("x_ref"), 6).as("x_ref"),
        round(col("hsum").cast("double") / col("k"), 6).as("hill_h"),
        round(col("k").cast("double") / col("hsum").cast("double"), 6)
          .as("alpha"))
  }
  private val q206Sql =
    """WITH top AS (
      |  SELECT CAST(o_totalprice AS DOUBLE) AS x
      |  FROM orders ORDER BY x DESC LIMIT 201),
      |ranked AS (
      |  SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC) AS r FROM top),
      |xr AS (SELECT x AS x_ref FROM ranked WHERE r = 201),
      |terms AS (
      |  SELECT x_ref, ROUND(LN(x / x_ref), 6) AS term
      |  FROM ranked CROSS JOIN xr WHERE r <= 200)
      |SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |  ROUND(x_ref, 6) AS x_ref,
      |  ROUND(CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE)
      |    / COUNT(*), 6) AS hill_h,
      |  ROUND(COUNT(*) / CAST(SUM(CAST(term AS DECIMAL(28,6)))
      |    AS DOUBLE), 6) AS alpha
      |FROM terms GROUP BY x_ref""".stripMargin

  /** q208: ORDER CYCLE TIME per priority — days from order placement
    * to its LAST line shipment: one order-keyed max aggregate joined
    * back on the same key (key-sized, no window), then a 5-row
    * priority rollup with exact-integer day sums and the q16
    * exact-percentile pair. The ops-SLA readout: does URGENT actually
    * ship faster, at the median and the tail? Hash-exact. */
  private val q208: QFn = (s, d) => {
    val lastShip = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("od"))
      .join(lastShip, Seq("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("last_ship"), col("od")).cast("long")
          .as("cycle_days"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("cycle_days")).cast("double") /
          count(lit(1)).cast("double"), 6).as("avg_days"),
        round(expr("percentile(cycle_days, 0.5)"), 6).as("p50_days"),
        round(expr("percentile(cycle_days, 0.9)"), 6).as("p90_days"))
      .orderBy("o_orderpriority")
  }
  private val q208Sql =
    """WITH ls AS (
      |  SELECT l_orderkey AS o_orderkey,
      |    MAX(CAST(l_shipdate AS DATE)) AS last_ship
      |  FROM lineitem GROUP BY 1),
      |cyc AS (
      |  SELECT o_orderpriority,
      |    CAST(last_ship - CAST(o_orderdate AS DATE) AS BIGINT)
      |      AS cycle_days
      |  FROM orders JOIN ls USING (o_orderkey))
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  ROUND(CAST(SUM(cycle_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
      |    6) AS avg_days,
      |  ROUND(quantile_cont(cycle_days, 0.5), 6) AS p50_days,
      |  ROUND(quantile_cont(cycle_days, 0.9), 6) AS p90_days
      |FROM cyc GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** q209: EMPIRICAL-BAYES SHRUNK late-ship ranking per supplier —
    * the small-n ranking fix next to q199's Wilson bound, as
    * estimation rather than a confidence bound: per-supplier late
    * rates (ship > 90 days after order) shrink toward the population
    * under a beta-binomial prior fitted by method of moments across
    * suppliers. Scale shape: one fact aggregate keyed by supplier,
    * the prior from two supplier-sized decimal folds (rates rounded
    * 6 dp into the exact accumulator — cross-engine stable — and a
    * one-row broadcast back), shrunk rate one fixed IEEE expression;
    * top-10 with tiebreaks. Hash-exact. */
  private val q209: QFn = (s, d) => {
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val perSupp = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey").as("supplier"))
      .agg(count(lit(1)).as("n"),
        count(when(datediff(to_date(col("l_shipdate")), col("od")) > 90,
          1)).as("late"))
      .withColumn("rate",
        round(col("late").cast("double") / col("n").cast("double"), 6))
    val prior = perSupp.agg(
      count(lit(1)).as("k"),
      sum(col("rate").cast(graft.util.Exact.Dec)).as("sr"),
      sum((col("rate") * col("rate")).cast(dec12)).as("sr2"))
    val kD = col("k").cast("double")
    val m = col("sr").cast("double") / kD
    val v = (col("sr2").cast("double") - kD * m * m) / (kD - 1)
    val a = m * (m * (lit(1.0) - m) / v - 1)
    val b = a * (lit(1.0) - m) / m
    val ab = prior.select(col("k"),
      round(m, 6).as("prior_mean"),
      when(v > 0 && m * (lit(1.0) - m) > v, round(a, 6)).as("alpha"),
      when(v > 0 && m * (lit(1.0) - m) > v, round(b, 6)).as("beta"))
    perSupp.crossJoin(broadcast(ab))
      .select(col("supplier"), col("n"), col("late"), col("rate"),
        col("prior_mean"), col("alpha"), col("beta"),
        round((col("alpha") + col("late").cast("double")) /
          (col("alpha") + col("beta") + col("n").cast("double")), 6)
          .as("shrunk_rate"))
      .orderBy(col("shrunk_rate").desc, col("supplier").asc)
      .limit(10)
  }
  private val q209Sql =
    """WITH ps AS (
      |  SELECT l_suppkey AS supplier, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(CASE WHEN CAST(l_shipdate AS DATE)
      |        - CAST(o_orderdate AS DATE) > 90 THEN 1 END) AS BIGINT)
      |      AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1),
      |pr AS (
      |  SELECT supplier, n, late,
      |    ROUND(CAST(late AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate
      |  FROM ps),
      |mom AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |    CAST(SUM(CAST(rate AS DECIMAL(28,6))) AS DOUBLE) AS sr,
      |    CAST(SUM(CAST(rate * rate AS DECIMAL(38,12))) AS DOUBLE) AS sr2
      |  FROM pr),
      |ab AS (
      |  SELECT k, ROUND(sr / k, 6) AS prior_mean,
      |    CASE WHEN (sr2 - k * (sr / k) * (sr / k)) / (k - 1) > 0
      |      AND (sr / k) * (1.0 - sr / k)
      |        > (sr2 - k * (sr / k) * (sr / k)) / (k - 1)
      |    THEN ROUND((sr / k) * ((sr / k) * (1.0 - sr / k)
      |      / ((sr2 - k * (sr / k) * (sr / k)) / (k - 1)) - 1), 6)
      |    END AS alpha,
      |    CASE WHEN (sr2 - k * (sr / k) * (sr / k)) / (k - 1) > 0
      |      AND (sr / k) * (1.0 - sr / k)
      |        > (sr2 - k * (sr / k) * (sr / k)) / (k - 1)
      |    THEN ROUND(((sr / k) * ((sr / k) * (1.0 - sr / k)
      |      / ((sr2 - k * (sr / k) * (sr / k)) / (k - 1)) - 1))
      |      * (1.0 - sr / k) / (sr / k), 6)
      |    END AS beta
      |  FROM mom)
      |SELECT supplier, n, late, rate, prior_mean, alpha, beta,
      |  ROUND((alpha + CAST(late AS DOUBLE))
      |    / (alpha + beta + CAST(n AS DOUBLE)), 6) AS shrunk_rate
      |FROM pr CROSS JOIN ab
      |ORDER BY shrunk_rate DESC, supplier ASC
      |LIMIT 10""".stripMargin

  /** q211: OUTLIER DAYS per month — daily revenue against the month's
    * own exact median + 1.5·IQR fence (the Tukey rule on the day
    * grain; the ops anomaly count). Scale shape: one day-grain
    * exact-decimal aggregate (≤ date-range rows), per-month exact
    * percentiles over ≤31 values, fence check via a month-sized
    * broadcast back. Hash-exact. */
  private val q211: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(dec6)).as("revd"))
      .select(date_format(col("day"), "yyyy-MM").as("month"),
        col("revd").cast("double").as("rev"))
    val stats = daily.groupBy("month").agg(
      count(lit(1)).as("n_days"),
      expr("percentile(rev, 0.25)").as("p25"),
      expr("percentile(rev, 0.5)").as("p50"),
      expr("percentile(rev, 0.75)").as("p75"))
    daily.join(broadcast(stats), Seq("month"))
      .groupBy(col("month"))
      .agg(first(col("n_days")).as("n_days"),
        round(first(col("p50")), 6).as("median_rev"),
        round(first(col("p75")) - first(col("p25")), 6).as("iqr"),
        sum(when(col("rev") > col("p50") +
          lit(1.5) * (col("p75") - col("p25")), 1L).otherwise(0L))
          .as("n_outlier_days"))
      .orderBy("month")
  }
  private val q211Sql =
    """WITH daily AS (
      |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |      AS rev
      |  FROM orders GROUP BY CAST(o_orderdate AS DATE),
      |    strftime(CAST(o_orderdate AS DATE), '%Y-%m')),
      |st AS (
      |  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    quantile_cont(rev, 0.25) AS p25,
      |    quantile_cont(rev, 0.5) AS p50,
      |    quantile_cont(rev, 0.75) AS p75
      |  FROM daily GROUP BY 1)
      |SELECT month, MIN(n_days) AS n_days,
      |  ROUND(MIN(p50), 6) AS median_rev,
      |  ROUND(MIN(p75) - MIN(p25), 6) AS iqr,
      |  CAST(SUM(CASE WHEN rev > p50 + 1.5 * (p75 - p25)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_days
      |FROM daily JOIN st USING (month)
      |GROUP BY month ORDER BY month""".stripMargin

  /** q212: COHEN'S D per brand between deep-discounted and full-price
    * line revenues — the EFFECT-SIZE companion to q136's Welch t
    * (significance says "real", d says "big enough to care"). One
    * grouped conditional aggregate; revenues rounded 6 dp into the
    * exact decimal first/second-moment folds (cross-engine-stable);
    * pooled SD + d one fixed IEEE expression. Hash-exact. */
  private val q212: QFn = (s, d) => {
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val xr = round(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
    val g = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        (col("l_discount") >= 0.05).cast("int").as("disc"), xr.as("x"))
      .groupBy("brand")
      .agg(
        sum(col("disc").cast("long")).as("n1"),
        sum(when(col("disc") === 1, col("x")).otherwise(lit(0.0))
          .cast(graft.util.Exact.Dec)).as("sx1"),
        sum(when(col("disc") === 1, col("x") * col("x"))
          .otherwise(lit(0.0)).cast(dec12)).as("sxx1"),
        sum(lit(1L) - col("disc").cast("long")).as("n0"),
        sum(when(col("disc") === 0, col("x")).otherwise(lit(0.0))
          .cast(graft.util.Exact.Dec)).as("sx0"),
        sum(when(col("disc") === 0, col("x") * col("x"))
          .otherwise(lit(0.0)).cast(dec12)).as("sxx0"))
    val n1 = col("n1").cast("double"); val n0 = col("n0").cast("double")
    val m1 = col("sx1").cast("double") / n1
    val m0 = col("sx0").cast("double") / n0
    val v1 = (col("sxx1").cast("double") - n1 * m1 * m1) / (n1 - 1)
    val v0 = (col("sxx0").cast("double") - n0 * m0 * m0) / (n0 - 1)
    val sp = sqrt(((n1 - 1) * v1 + (n0 - 1) * v0) / (n1 + n0 - 2))
    g.filter(col("n1") > 1 && col("n0") > 1)
      .select(col("brand"), col("n1"), col("n0"),
        round(m1, 6).as("mean_disc"), round(m0, 6).as("mean_full"),
        round((m1 - m0) / sp, 6).as("cohens_d"))
      .orderBy("brand")
  }
  private val q212Sql =
    """WITH g AS (
      |  SELECT p_brand AS brand,
      |    CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1,
      |    SUM(CAST(CASE WHEN l_discount >= 0.05
      |      THEN ROUND(l_extendedprice * (1 - l_discount), 6)
      |      ELSE 0.0 END AS DECIMAL(28,6))) AS sx1,
      |    SUM(CAST(CASE WHEN l_discount >= 0.05
      |      THEN ROUND(l_extendedprice * (1 - l_discount), 6)
      |        * ROUND(l_extendedprice * (1 - l_discount), 6)
      |      ELSE 0.0 END AS DECIMAL(38,12))) AS sxx1,
      |    CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 0 ELSE 1 END)
      |      AS BIGINT) AS n0,
      |    SUM(CAST(CASE WHEN l_discount < 0.05
      |      THEN ROUND(l_extendedprice * (1 - l_discount), 6)
      |      ELSE 0.0 END AS DECIMAL(28,6))) AS sx0,
      |    SUM(CAST(CASE WHEN l_discount < 0.05
      |      THEN ROUND(l_extendedprice * (1 - l_discount), 6)
      |        * ROUND(l_extendedprice * (1 - l_discount), 6)
      |      ELSE 0.0 END AS DECIMAL(38,12))) AS sxx0
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1)
      |SELECT brand, n1, n0,
      |  ROUND(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mean_disc,
      |  ROUND(CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS mean_full,
      |  ROUND((CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |    / SQRT(((CAST(n1 AS DOUBLE) - 1)
      |        * ((CAST(sxx1 AS DOUBLE) - CAST(n1 AS DOUBLE)
      |          * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE))
      |          * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
      |          / (CAST(n1 AS DOUBLE) - 1))
      |      + (CAST(n0 AS DOUBLE) - 1)
      |        * ((CAST(sxx0 AS DOUBLE) - CAST(n0 AS DOUBLE)
      |          * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |          * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
      |          / (CAST(n0 AS DOUBLE) - 1)))
      |      / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2)), 6)
      |    AS cohens_d
      |FROM g WHERE n1 > 1 AND n0 > 1
      |ORDER BY brand""".stripMargin

  /** q214: NATION-TO-NATION TRADE FLOW matrix — revenue by (supplier
    * nation → customer nation), top-20 corridors: q202's balance
    * decomposed into its off-diagonal flows. Scale shape: ONE
    * fact-fact co-partitioned join (lineitem⋈orders on the order
    * key — the natural co-location key), every dim broadcast, then a
    * ≤625-cell aggregate and a bounded top-k. Exact-decimal revenue;
    * hash-exact. */
  private val q214: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val sup = broadcast(Tables.supplier(s, d)
      .join(Tables.nation(s, d),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cus = broadcast(Tables.customer(s, d)
      .join(Tables.nation(s, d),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(cus, col("o_custkey") === col("c_custkey"))
      .groupBy("supp_nation", "cust_nation")
      .agg(count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec6)).as("fr"))
      .select(col("supp_nation"), col("cust_nation"), col("n_lines"),
        col("fr").cast("double").as("flow_rev"))
      .orderBy(col("flow_rev").desc, col("supp_nation").asc,
        col("cust_nation").asc)
      .limit(20)
  }
  private val q214Sql =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS flow_rev
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |GROUP BY 1, 2
      |ORDER BY flow_rev DESC, supp_nation ASC, cust_nation ASC
      |LIMIT 20""".stripMargin

  /** q215: POPULATION STABILITY INDEX of order values across eras —
    * the ML-ops drift gauge (PSI > 0.25 = retrain the model): decile
    * bins CUT ON THE BASE ERA (pre-1996), both eras histogrammed into
    * them, PSI = Σ (p_cur − p_base)·ln(p_cur/p_base) with the
    * standard 1e-6 floor. Scale shape: one exact-percentile aggregate
    * on the base era (9 cuts, one row, broadcast), bin assignment a
    * fixed 9-comparison expression per row, two 10-cell histograms;
    * per-bin terms 6-dp into the exact decimal fold. Hash-exact. */
  private val q215: QFn = (s, d) => {
    val o = Tables.orders(s, d).select(
      col("o_totalprice").cast("double").as("x"),
      (to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date"))
        .cast("int").as("era"))
    val cutCols = (1 to 9).map(i =>
      expr(s"percentile(x, 0.$i)").as(s"c$i"))
    val cuts = o.filter(col("era") === 0)
      .agg(cutCols.head, cutCols.tail: _*)
    val bin = (1 to 9).map(i => when(col("x") > col(s"c$i"), 1)
      .otherwise(0)).reduce(_ + _) + lit(1)
    val hist = o.crossJoin(broadcast(cuts))
      .select(col("era"), bin.as("bin"))
      .groupBy("bin")
      .agg(sum(when(col("era") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("era") === 1, 1L).otherwise(0L)).as("c"))
    val tot = hist.agg(sum(col("b")).as("nb"), sum(col("c")).as("nc"))
    val p0 = greatest(col("b").cast("double") / col("nb").cast("double"),
      lit(1e-6))
    val p1 = greatest(col("c").cast("double") / col("nc").cast("double"),
      lit(1e-6))
    hist.crossJoin(broadcast(tot))
      .select(col("nb"), col("nc"),
        round((p1 - p0) * log(p1 / p0), 6).as("term"))
      .groupBy("nb", "nc")
      .agg(round(sum(col("term").cast(graft.util.Exact.Dec))
        .cast("double"), 6).as("psi"))
      .select(col("nb").as("n_base"), col("nc").as("n_current"),
        col("psi"))
  }
  private val q215Sql =
    """WITH o AS (
      |  SELECT CAST(o_totalprice AS DOUBLE) AS x,
      |    CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |      THEN 1 ELSE 0 END AS era
      |  FROM orders),
      |cuts AS (
      |  SELECT quantile_cont(x, 0.1) AS c1, quantile_cont(x, 0.2) AS c2,
      |    quantile_cont(x, 0.3) AS c3, quantile_cont(x, 0.4) AS c4,
      |    quantile_cont(x, 0.5) AS c5, quantile_cont(x, 0.6) AS c6,
      |    quantile_cont(x, 0.7) AS c7, quantile_cont(x, 0.8) AS c8,
      |    quantile_cont(x, 0.9) AS c9
      |  FROM o WHERE era = 0),
      |hist AS (
      |  SELECT 1 + (CASE WHEN x > c1 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x > c2 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x > c3 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x > c4 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x > c5 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x > c6 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x > c7 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x > c8 THEN 1 ELSE 0 END)
      |    + (CASE WHEN x > c9 THEN 1 ELSE 0 END) AS bin,
      |    CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM o CROSS JOIN cuts
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(b) AS BIGINT) AS nb,
      |  CAST(SUM(c) AS BIGINT) AS nc FROM hist),
      |terms AS (
      |  SELECT nb, nc,
      |    ROUND((GREATEST(CAST(c AS DOUBLE) / CAST(nc AS DOUBLE), 1e-6)
      |        - GREATEST(CAST(b AS DOUBLE) / CAST(nb AS DOUBLE), 1e-6))
      |      * LN(GREATEST(CAST(c AS DOUBLE) / CAST(nc AS DOUBLE), 1e-6)
      |        / GREATEST(CAST(b AS DOUBLE) / CAST(nb AS DOUBLE), 1e-6)),
      |      6) AS term
      |  FROM hist CROSS JOIN tot)
      |SELECT nb AS n_base, nc AS n_current,
      |  ROUND(CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE), 6)
      |    AS psi
      |FROM terms GROUP BY 1, 2""".stripMargin

  /** q216: MANN–KENDALL trend test on monthly revenue — the
    * nonparametric "is it actually trending" answer (no linearity or
    * normality assumed; the stats sweep's trend chapter next to q169's
    * OLS slope and q176's Theil–Sen): S = Σ sign(x_j − x_i) over
    * ordered month pairs, Var(S) = n(n−1)(2n+5)/18 (continuous
    * revenue ⇒ no ties), Z with the ±1 continuity correction. Scale
    * shape: the series is month-grain (≤ date-range rows) — the pair
    * self-join is |months|², model-sized; everything upstream is one
    * exact-decimal aggregate. Hash-exact. */
  private val q216: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val monthly = Tables.orders(s, d)
      .groupBy(date_format(to_date(col("o_orderdate")), "yyyy-MM")
        .as("month"))
      .agg(sum(col("o_totalprice").cast(dec6)).as("revd"))
      .select(col("month"), col("revd").cast("double").as("rev"))
    val a = monthly.select(col("month").as("m1"), col("rev").as("x1"))
    val b = monthly.select(col("month").as("m2"), col("rev").as("x2"))
    val pairs = a.join(b, col("m1") < col("m2"))
      .agg(sum(signum(col("x2") - col("x1")).cast("long")).as("s_stat"))
    val n = monthly.agg(count(lit(1)).as("n_months"))
    val nD = col("n_months").cast("double")
    val sD = col("s_stat").cast("double")
    val varS = nD * (nD - 1) * (nD * 2 + 5) / 18
    pairs.crossJoin(broadcast(n))
      .select(col("n_months"), col("s_stat"),
        round(when(col("s_stat") > 0, (sD - 1) / sqrt(varS))
          .when(col("s_stat") < 0, (sD + 1) / sqrt(varS))
          .otherwise(lit(0.0)), 6).as("z"))
  }
  private val q216Sql =
    """WITH monthly AS (
      |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |      AS rev
      |  FROM orders GROUP BY 1),
      |s AS (
      |  SELECT CAST(SUM(CAST(SIGN(b.rev - a.rev) AS BIGINT)) AS BIGINT)
      |    AS s_stat
      |  FROM monthly a JOIN monthly b ON a.month < b.month),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM monthly)
      |SELECT n_months, s_stat,
      |  ROUND(CASE
      |    WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1)
      |      / SQRT(CAST(n_months AS DOUBLE) * (n_months - 1)
      |        * (2 * n_months + 5) / 18)
      |    WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1)
      |      / SQRT(CAST(n_months AS DOUBLE) * (n_months - 1)
      |        * (2 * n_months + 5) / 18)
      |    ELSE 0.0 END, 6) AS z
      |FROM s CROSS JOIN n""".stripMargin

  /** q218: LASPEYRES PRICE INDEX per month — unit prices weighted by
    * the 1995 base-year basket — the dataset's first full year —
    * (Σ p_t·q₀ / Σ p₀·q₀ over parts traded
    * in both), the econ-style inflation readout over the catalog.
    * Scale shape: per-(part, month) and per-part-base exact-decimal
    * price/qty aggregates (part-sized), one part-keyed join, and
    * per-month folds of 6-dp-rounded p·q₀ terms through the exact
    * decimal accumulator (a raw double Σ over parts would be
    * partition-order-dependent). Hash-exact. */
  private val q218: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val li = Tables.lineitem(s, d).select(col("l_partkey"),
      to_date(col("l_shipdate")).as("sd"),
      col("l_extendedprice"), col("l_quantity"))
    val base = li.filter(year(col("sd")) === 1995)
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast(dec6)).as("e0"),
        sum(col("l_quantity").cast(dec6)).as("q0"))
      .select(col("l_partkey"),
        (col("e0").cast("double") / col("q0").cast("double")).as("p0"),
        col("q0").cast("double").as("q0d"))
    val cur = li.groupBy(col("l_partkey"),
        date_format(col("sd"), "yyyy-MM").as("month"))
      .agg(sum(col("l_extendedprice").cast(dec6)).as("et"),
        sum(col("l_quantity").cast(dec6)).as("qt"))
      .select(col("l_partkey"), col("month"),
        (col("et").cast("double") / col("qt").cast("double")).as("pt"))
    cur.join(base, Seq("l_partkey"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_parts"),
        sum(round(col("pt") * col("q0d"), 6)
          .cast(graft.util.Exact.Dec)).as("num"),
        sum(round(col("p0") * col("q0d"), 6)
          .cast(graft.util.Exact.Dec)).as("den"))
      .select(col("month"), col("n_parts"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("laspeyres_index"))
      .orderBy("month")
  }
  private val q218Sql =
    """WITH base AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
      |      / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
      |      AS p0,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS q0d
      |  FROM lineitem
      |  WHERE EXTRACT(year FROM CAST(l_shipdate AS DATE)) = 1995
      |  GROUP BY 1),
      |cur AS (
      |  SELECT l_partkey,
      |    strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
      |      / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
      |      AS pt
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  ROUND(CAST(SUM(CAST(ROUND(pt * q0d, 6) AS DECIMAL(28,6)))
      |      AS DOUBLE)
      |    / CAST(SUM(CAST(ROUND(p0 * q0d, 6) AS DECIMAL(28,6)))
      |      AS DOUBLE), 6) AS laspeyres_index
      |FROM cur JOIN base USING (l_partkey)
      |GROUP BY month ORDER BY month""".stripMargin

  /** q220: SEASONALITY STRENGTH per nation — η² of the month-of-year
    * factor over the nation's monthly revenue series (variance share
    * the calendar explains; q147's effect turned into one comparable
    * number per geography). Scale shape: month-grain series per
    * nation (date-range-sized), all moments 6-dp-rounded into exact
    * decimal folds, η² = SSB/SST one fixed IEEE expression over the
    * ≤12 group terms. Hash-exact. */
  private val q220: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val monthly = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM").as("ym"),
        month(to_date(col("o_orderdate"))).as("moy"))
      .agg(sum(col("o_totalprice").cast(dec6)).as("revd"))
      .select(col("nation"), col("moy"),
        col("revd").cast("double").as("x"))
    val byMoy = monthly.groupBy("nation", "moy")
      .agg(count(lit(1)).as("nj"),
        sum(round(col("x"), 6).cast(graft.util.Exact.Dec)).as("sxj"))
      .select(col("nation"),
        round((col("sxj").cast("double") * col("sxj").cast("double")) /
          col("nj").cast("double"), 6).as("grp_term"))
      .groupBy("nation")
      .agg(sum(col("grp_term").cast(graft.util.Exact.Dec)).as("ssb_raw"))
    val tot = monthly.groupBy("nation")
      .agg(count(lit(1)).as("n"),
        sum(round(col("x"), 6).cast(graft.util.Exact.Dec)).as("sx"),
        sum(round(col("x") * col("x"), 6).cast(dec12)).as("sxx"))
    val nD = col("n").cast("double")
    val cm = col("sx").cast("double") * col("sx").cast("double") / nD
    tot.join(byMoy, Seq("nation"))
      .select(col("nation"), col("n").as("n_months"),
        round((col("ssb_raw").cast("double") - cm) /
          (col("sxx").cast("double") - cm), 6).as("eta_sq"))
      .orderBy("nation")
  }
  private val q220Sql =
    """WITH monthly AS (
      |  SELECT n_name AS nation,
      |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
      |    EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS moy,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS x
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2, 3),
      |bym AS (
      |  SELECT nation,
      |    SUM(CAST(grp_term AS DECIMAL(28,6))) AS ssb_raw
      |  FROM (
      |    SELECT nation,
      |      ROUND((CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6)))
      |          AS DOUBLE)
      |        * CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE))
      |        / CAST(COUNT(*) AS DOUBLE), 6) AS grp_term
      |    FROM monthly GROUP BY nation, moy) t
      |  GROUP BY 1),
      |tot AS (
      |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(38,12))) AS DOUBLE)
      |      AS sxx
      |  FROM monthly GROUP BY 1)
      |SELECT nation, n AS n_months,
      |  ROUND((CAST(ssb_raw AS DOUBLE) - sx * sx / CAST(n AS DOUBLE))
      |    / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS eta_sq
      |FROM tot JOIN bym USING (nation)
      |ORDER BY nation""".stripMargin

  /** q221: REGION REVENUE-SHARE TREND — yearly revenue share per
    * region plus the exact OLS slope of that share over the years
    * (which geography is structurally gaining): the q169 regression
    * machinery applied per-group to a years-long series. Scale shape:
    * one fact aggregate with dims broadcast (region × year cells),
    * shares + slope fixed IEEE over exact decimal sums — the series
    * is ≤10 points per region, so Σxy folds over rounded 6-dp terms.
    * Hash-exact. */
  private val q221: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val yearly = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"),
        year(to_date(col("o_orderdate"))).as("yr"))
      .agg(sum(col("o_totalprice").cast(dec6)).as("revd"))
    val tot = yearly.groupBy("yr")
      .agg(sum(col("revd")).as("trev"))
    val shares = yearly.join(broadcast(tot), Seq("yr"))
      .select(col("region"), col("yr").cast("double").as("x"),
        round(col("revd").cast("double") / col("trev").cast("double"),
          6).as("share"))
    shares.groupBy("region")
      .agg(count(lit(1)).as("n_years"),
        sum(col("x").cast(graft.util.Exact.Dec)).as("sx"),
        sum(col("share").cast(graft.util.Exact.Dec)).as("sy"),
        sum(round(col("x") * col("share"), 6)
          .cast(graft.util.Exact.Dec)).as("sxy"),
        sum(round(col("x") * col("x"), 6)
          .cast(graft.util.Exact.Dec)).as("sxx"))
      .select(col("region"), col("n_years"),
        round(col("sy").cast("double") / col("n_years").cast("double"),
          6).as("mean_share"),
        round((col("n_years").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n_years").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("share_slope_per_year"))
      .orderBy("region")
  }
  private val q221Sql =
    """WITH yearly AS (
      |  SELECT r_name AS region,
      |    EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS yr,
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS revd
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT yr, SUM(revd) AS trev FROM yearly GROUP BY 1),
      |shares AS (
      |  SELECT region, CAST(yr AS DOUBLE) AS x,
      |    ROUND(CAST(revd AS DOUBLE) / CAST(trev AS DOUBLE), 6) AS share
      |  FROM yearly JOIN tot USING (yr)),
      |g AS (
      |  SELECT region, CAST(COUNT(*) AS BIGINT) AS n_years,
      |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(share AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(ROUND(x * share, 6) AS DECIMAL(28,6)))
      |      AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE)
      |      AS sxx
      |  FROM shares GROUP BY 1)
      |SELECT region, n_years,
      |  ROUND(sy / CAST(n_years AS DOUBLE), 6) AS mean_share,
      |  ROUND((CAST(n_years AS DOUBLE) * sxy - sx * sy)
      |    / (CAST(n_years AS DOUBLE) * sxx - sx * sx), 6)
      |    AS share_slope_per_year
      |FROM g ORDER BY region""".stripMargin

  /** q222: EXACT MODE of line quantity per brand (deterministic
    * tiebreak: highest count, then smallest quantity) with its
    * frequency share — the one basic descriptive aggregate the sweep
    * lacked. One (brand, qty) aggregate, per-brand argmax via a
    * keyed WindowGroupLimit-able row_number, share one IEEE divide.
    * Hash-exact. */
  private val q222: QFn = (s, d) => {
    val cnt = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        col("l_quantity").cast("long").as("qty"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("brand").agg(sum(col("c")).as("n"))
    val w = Window.partitionBy("brand")
      .orderBy(col("c").desc, col("qty").asc)
    cnt.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(broadcast(tot), Seq("brand"))
      .select(col("brand"), col("qty").as("mode_qty"),
        col("c").as("mode_count"), col("n").as("n_lines"),
        round(col("c").cast("double") / col("n").cast("double"), 6)
          .as("mode_share"))
      .orderBy("brand")
  }
  private val q222Sql =
    """WITH cnt AS (
      |  SELECT p_brand AS brand, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT brand, CAST(SUM(c) AS BIGINT) AS n
      |  FROM cnt GROUP BY 1),
      |rk AS (
      |  SELECT brand, qty, c,
      |    ROW_NUMBER() OVER (PARTITION BY brand ORDER BY c DESC, qty ASC)
      |      AS rk
      |  FROM cnt)
      |SELECT brand, qty AS mode_qty, c AS mode_count, n AS n_lines,
      |  ROUND(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mode_share
      |FROM rk JOIN tot USING (brand)
      |WHERE rk = 1 ORDER BY brand""".stripMargin

  /** q223: LONGEST MONTHLY GROWTH STREAK per nation — gaps-and-islands
    * (q95's machinery) on the month-grain revenue series: consecutive
    * months of strictly increasing revenue, longest run + its end.
    * Scale shape: the series is month-grain per nation (date-range ×
    * 25 rows); windows are nation-keyed. Hash-exact. */
  private val q223: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val monthly = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(sum(col("o_totalprice").cast(dec6)).as("revd"))
      .select(col("nation"), col("month"),
        col("revd").cast("double").as("rev"))
    val wOrd = Window.partitionBy("nation").orderBy("month")
    val runs = monthly
      .withColumn("up",
        when(col("rev") > lag(col("rev"), 1).over(wOrd), 1L)
          .otherwise(0L))
      .withColumn("brk", (lit(1L) - col("up")))
      .withColumn("grp", sum(col("brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy("nation", "grp")
      .agg(count(lit(1)).as("len"), max(col("month")).as("run_end"))
      .withColumn("rk", row_number().over(Window.partitionBy("nation")
        .orderBy(col("len").desc, col("run_end").asc)))
      .filter(col("rk") === 1)
      .select(col("nation"), col("len").as("longest_growth_months"),
        col("run_end").as("streak_end"))
      .orderBy("nation")
  }
  private val q223Sql =
    """WITH monthly AS (
      |  SELECT n_name AS nation,
      |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |      AS rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |brks AS (
      |  SELECT nation, month,
      |    CASE WHEN rev > LAG(rev) OVER (PARTITION BY nation
      |      ORDER BY month) THEN 0 ELSE 1 END AS brk
      |  FROM monthly),
      |runs AS (
      |  SELECT nation, month,
      |    CAST(SUM(brk) OVER (PARTITION BY nation ORDER BY month
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS grp
      |  FROM brks),
      |islands AS (
      |  SELECT nation, grp, CAST(COUNT(*) AS BIGINT) AS len,
      |    MAX(month) AS run_end
      |  FROM runs GROUP BY 1, 2),
      |best AS (
      |  SELECT nation, len, run_end,
      |    ROW_NUMBER() OVER (PARTITION BY nation
      |      ORDER BY len DESC, run_end ASC) AS rk
      |  FROM islands)
      |SELECT nation, len AS longest_growth_months,
      |  run_end AS streak_end
      |FROM best WHERE rk = 1 ORDER BY nation""".stripMargin

  /** q224: ACTIVATION LAG — days from a customer's FIRST to SECOND
    * order, rolled up per market segment (n, mean, exact p50/p90):
    * how fast a new account converts into a repeat account, the
    * retention planning number next to q198's steady-state rate.
    * Keyed window rank per customer (never global), exact-integer day
    * sums, the q16 percentile pair. Hash-exact. */
  private val q224: QFn = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("od").asc, col("o_orderkey").asc)
    val lag2 = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        datediff(max(col("od")), min(col("od"))).cast("long").as("lag"))
      .filter(col("n") === 2)
    lag2.join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_repeat"),
        round(sum(col("lag")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_days"),
        round(expr("percentile(lag, 0.5)"), 6).as("p50_days"),
        round(expr("percentile(lag, 0.9)"), 6).as("p90_days"))
      .orderBy("segment")
  }
  private val q224Sql =
    """WITH rk AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rk
      |  FROM orders),
      |lag2 AS (
      |  SELECT o_custkey, COUNT(*) AS n,
      |    CAST(MAX(od) - MIN(od) AS BIGINT) AS lag
      |  FROM rk WHERE rk <= 2 GROUP BY 1 HAVING COUNT(*) = 2)
      |SELECT c_mktsegment AS segment,
      |  CAST(COUNT(*) AS BIGINT) AS n_repeat,
      |  ROUND(CAST(SUM(lag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
      |    AS mean_days,
      |  ROUND(quantile_cont(lag, 0.5), 6) AS p50_days,
      |  ROUND(quantile_cont(lag, 0.9), 6) AS p90_days
      |FROM lag2 JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY segment""".stripMargin

  /** q227: ORDER-PRIORITY TRANSITION MATRIX — q103's Markov counting
    * on the ORDER history: for consecutive orders of the same
    * customer, P(next priority | this priority), row-normalized with
    * exact counts (does URGENT beget URGENT — the escalation
    * diagnosis). Customer-keyed lead window, one pair aggregate, a
    * 25-cell matrix; probability one IEEE divide at 6 dp. Hash-exact. */
  private val q227: QFn = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("od").asc, col("o_orderkey").asc)
    val pairs = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        col("o_orderpriority").as("p_from"))
      .withColumn("p_to", lead(col("p_from"), 1).over(w))
      .filter(col("p_to").isNotNull)
      .groupBy("p_from", "p_to").agg(count(lit(1)).as("c"))
    val tot = pairs.groupBy("p_from").agg(sum(col("c")).as("n"))
    pairs.join(broadcast(tot), Seq("p_from"))
      .select(col("p_from"), col("p_to"), col("c"),
        round(col("c").cast("double") / col("n").cast("double"), 6)
          .as("p"))
      .orderBy("p_from", "p_to")
  }
  private val q227Sql =
    """WITH seq AS (
      |  SELECT o_orderpriority AS p_from,
      |    LEAD(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS p_to
      |  FROM orders),
      |pairs AS (
      |  SELECT p_from, p_to, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM seq WHERE p_to IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT p_from, CAST(SUM(c) AS BIGINT) AS n
      |  FROM pairs GROUP BY 1)
      |SELECT p_from, p_to, c,
      |  ROUND(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p
      |FROM pairs JOIN tot USING (p_from)
      |ORDER BY p_from, p_to""".stripMargin

  /** q228: DORMANCY REACTIVATION per nation — customers who went
    * quiet ≥ 180 days between consecutive orders and came back, vs
    * all repeat customers (the win-back base rate). Customer-keyed
    * lag only; two exact-count rollups; rate one IEEE divide.
    * Hash-exact. */
  private val q228: QFn = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("od").asc, col("o_orderkey").asc)
    val gaps = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"))
      .withColumn("gap",
        datediff(col("od"), lag(col("od"), 1).over(w)).cast("long"))
      .filter(col("gap").isNotNull)
      .groupBy("o_custkey")
      .agg(max(when(col("gap") >= 180L, 1L).otherwise(0L))
        .as("reactivated"))
    gaps.join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_repeat_customers"),
        sum(col("reactivated")).as("n_reactivated"))
      .select(col("nation"), col("n_repeat_customers"),
        col("n_reactivated"),
        round(col("n_reactivated").cast("double") /
          col("n_repeat_customers").cast("double"), 6)
          .as("reactivation_rate"))
      .orderBy("nation")
  }
  private val q228Sql =
    """WITH gaps AS (
      |  SELECT o_custkey,
      |    CAST(CAST(o_orderdate AS DATE)
      |      - LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |        ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
      |      AS BIGINT) AS gap
      |  FROM orders),
      |cust AS (
      |  SELECT o_custkey,
      |    CAST(MAX(CASE WHEN gap >= 180 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS reactivated
      |  FROM gaps WHERE gap IS NOT NULL GROUP BY 1)
      |SELECT n_name AS nation,
      |  CAST(COUNT(*) AS BIGINT) AS n_repeat_customers,
      |  CAST(SUM(reactivated) AS BIGINT) AS n_reactivated,
      |  ROUND(CAST(SUM(reactivated) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS reactivation_rate
      |FROM cust
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY nation""".stripMargin

  /** q226: MARKET PENETRATION CURVE per nation — cumulative distinct
    * customers acquired by each year (q219's first-occurrence trick on
    * the customer domain: is the geography still acquiring?). One
    * (customer → first order year) key-sized aggregate, a years-grid
    * fanout bounded by |years|·|nations|; exact counts. Hash-exact. */
  private val q226: QFn = (s, d) => {
    val first = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(min(year(to_date(col("o_orderdate")))).as("first_yr"))
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("first_yr"))
    val years = Tables.orders(s, d)
      .select(year(to_date(col("o_orderdate"))).as("yr")).distinct()
    first.crossJoin(broadcast(years))
      .filter(col("first_yr") <= col("yr"))
      .groupBy("nation", "yr")
      .agg(count(lit(1)).as("customers_acquired"))
      .orderBy("nation", "yr")
  }
  private val q226Sql =
    """WITH first AS (
      |  SELECT n_name AS nation,
      |    MIN(EXTRACT(year FROM CAST(o_orderdate AS DATE))) AS first_yr
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY o_custkey, n_name),
      |years AS (
      |  SELECT DISTINCT EXTRACT(year FROM CAST(o_orderdate AS DATE))
      |    AS yr FROM orders)
      |SELECT nation, CAST(yr AS INT) AS yr,
      |  CAST(COUNT(*) AS BIGINT) AS customers_acquired
      |FROM first CROSS JOIN years
      |WHERE first_yr <= yr
      |GROUP BY 1, 2 ORDER BY nation, yr""".stripMargin

  /** q229: 10% TRIMMED MEAN of order value per segment vs the plain
    * mean — the robust-location estimator (how much do the tails
    * distort the average a dashboard shows). Exact percentile cuts
    * per segment (broadcast back), conditional exact-decimal mean of
    * the inner 80%. Hash-exact. */
  private val q229: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val o = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("o_totalprice").cast("double").as("x"))
    val cuts = o.groupBy("segment").agg(
      expr("percentile(x, 0.1)").as("lo"),
      expr("percentile(x, 0.9)").as("hi"))
    o.join(broadcast(cuts), Seq("segment"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n"),
        round(sum(col("x").cast(dec6)).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean"),
        sum(when(col("x") >= col("lo") && col("x") <= col("hi"), 1L)
          .otherwise(0L)).as("n_kept"),
        round(sum(when(col("x") >= col("lo") && col("x") <= col("hi"),
          col("x")).otherwise(lit(0.0)).cast(dec6)).cast("double") /
          sum(when(col("x") >= col("lo") && col("x") <= col("hi"), 1L)
            .otherwise(0L)).cast("double"), 6).as("trimmed_mean"))
      .orderBy("segment")
  }
  private val q229Sql =
    """WITH o AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(o_totalprice AS DOUBLE) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cuts AS (
      |  SELECT segment, quantile_cont(x, 0.1) AS lo,
      |    quantile_cont(x, 0.9) AS hi
      |  FROM o GROUP BY 1)
      |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
      |  ROUND(CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean,
      |  CAST(SUM(CASE WHEN x >= lo AND x <= hi THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept,
      |  ROUND(CAST(SUM(CAST(CASE WHEN x >= lo AND x <= hi THEN x
      |      ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
      |    / CAST(SUM(CASE WHEN x >= lo AND x <= hi THEN 1 ELSE 0 END)
      |      AS DOUBLE), 6) AS trimmed_mean
      |FROM o JOIN cuts USING (segment)
      |GROUP BY segment ORDER BY segment""".stripMargin

  /** q230: EXPECTED SHORTFALL (CVaR) of daily revenue — the mean of
    * the worst 5% of days below the exact p5 cut (the risk number a
    * sup-statistic like q137's KS can't give): how bad is a bad day,
    * not just how often. Day-grain exact-decimal series, one-row cut
    * broadcast, conditional decimal mean. Hash-exact. */
  private val q230: QFn = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(dec6)).as("revd"))
      .select(col("revd").cast("double").as("rev"))
    val cut = daily.agg(expr("percentile(rev, 0.05)").as("var5"),
      count(lit(1)).as("n_days"))
    daily.crossJoin(broadcast(cut))
      .select(col("n_days"), col("var5"),
        when(col("rev") <= col("var5"), col("rev")).as("tail"))
      .groupBy("n_days")
      .agg(round(first(col("var5")), 6).as("var_5pct"),
        count(col("tail")).as("n_tail_days"),
        round(sum(col("tail").cast(dec6)).cast("double") /
          count(col("tail")).cast("double"), 6).as("cvar_5pct"))
  }
  private val q230Sql =
    """WITH daily AS (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    AS rev
      |  FROM orders GROUP BY CAST(o_orderdate AS DATE)),
      |cut AS (
      |  SELECT quantile_cont(rev, 0.05) AS var5,
      |    CAST(COUNT(*) AS BIGINT) AS n_days
      |  FROM daily)
      |SELECT n_days, ROUND(MIN(var5), 6) AS var_5pct,
      |  CAST(COUNT(CASE WHEN rev <= var5 THEN 1 END) AS BIGINT)
      |    AS n_tail_days,
      |  ROUND(CAST(SUM(CAST(CASE WHEN rev <= var5 THEN rev END
      |      AS DECIMAL(28,6))) AS DOUBLE)
      |    / COUNT(CASE WHEN rev <= var5 THEN 1 END), 6) AS cvar_5pct
      |FROM daily CROSS JOIN cut
      |GROUP BY n_days""".stripMargin

  /** q231: ANNUAL RETENTION matrix — of the customers active in year
    * Y, the share still active in Y+1 (the order-history twin of
    * q89's event cohorts, at the planning grain). Two key-sized
    * distinct sets self-joined on customer; exact counts. */
  private val q231: QFn = (s, d) => {
    val active = Tables.orders(s, d)
      .select(col("o_custkey"),
        year(to_date(col("o_orderdate"))).as("yr"))
      .distinct()
    // disjoint names on the probe side: a self-join sharing lineage
    // trips Spark's ambiguous-attribute resolution otherwise
    val nxt = active.select(col("o_custkey").as("c2"),
      (col("yr") - 1).as("yr2"))
    active.join(nxt,
        col("yr") === col("yr2") && col("o_custkey") === col("c2"),
        "left")
      .groupBy(col("yr").as("year"))
      .agg(count(lit(1)).as("n_active"),
        count(col("c2")).as("n_retained"))
      .select(col("year"), col("n_active"), col("n_retained"),
        round(col("n_retained").cast("double") /
          col("n_active").cast("double"), 6).as("retention"))
      .orderBy("year")
  }
  private val q231Sql =
    """WITH active AS (
      |  SELECT DISTINCT o_custkey,
      |    CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INT)
      |      AS yr
      |  FROM orders)
      |SELECT a.yr AS year, CAST(COUNT(*) AS BIGINT) AS n_active,
      |  CAST(COUNT(b.o_custkey) AS BIGINT) AS n_retained,
      |  ROUND(CAST(COUNT(b.o_custkey) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS retention
      |FROM active a
      |LEFT JOIN active b
      |  ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
      |GROUP BY 1 ORDER BY year""".stripMargin

  /** q232: RELATIONAL DIVISION — customers with at least one order in
    * EVERY quarter of 1995 ("for all" over a finite divisor set), the
    * classic Codd division the sweep lacked, plus their 1995 spend.
    * Scale shape: one year-filtered fact aggregate with map-side
    * partials (count-distinct over 4 quarter values expands cheaply),
    * the HAVING on the key-sized aggregate, dims broadcast on last.
    * Exact-decimal spend → double at the boundary; hash-exact. */
  private val q232: QFn = (s, d) => {
    val o = Tables.orders(s, d)
      .withColumn("od", to_date(col("o_orderdate")))
      .filter(year(col("od")) === 1995)
    val per = o.groupBy("o_custkey")
      .agg(countDistinct(quarter(col("od"))).as("nq"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("spend_95"))
      .filter(col("nq") === 4)
    per.join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("nation"), col("n_orders"),
        col("spend_95"))
  }
  private val q232Sql =
    s"""SELECT c_custkey, n_name AS nation,
       |  CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  ${sqlSum("o_totalprice")} AS spend_95
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1995
       |GROUP BY 1, 2
       |HAVING COUNT(DISTINCT
       |  EXTRACT(quarter FROM CAST(o_orderdate AS DATE))) = 4""".stripMargin

  /** q233: REFERENTIAL-INTEGRITY AUDIT — orphan counts across the
    * schema's FK edges (lineitem→orders, lineitem→part,
    * lineitem→supplier, orders→customer): the DQ check every
    * ingestion pipeline runs before trusting a join. Each edge is one
    * LEFT ANTI join — dims broadcast, the fact-fact edge
    * co-partitioned on the order key — then a 1-row count; the four
    * rows union. Exact integers + one 6-dp rate; hash-exact. */
  private val q233: QFn = (s, d) => {
    val li = Tables.lineitem(s, d)
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String, bcast: Boolean): DataFrame = {
      val p = parent.select(col(parentKey))
      val orphans = child.join(if (bcast) broadcast(p) else p,
        col(childKey) === col(parentKey), "left_anti")
      child.agg(count(lit(1)).as("n_child")).crossJoin(
          orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("edge"), col("n_child"), col("n_orphans"),
          round(col("n_orphans").cast("double") /
            col("n_child").cast("double"), 6).as("orphan_rate"))
    }
    edge("lineitem->orders", li, "l_orderkey",
        Tables.orders(s, d), "o_orderkey", bcast = false)
      .unionAll(edge("lineitem->part", li, "l_partkey",
        Tables.part(s, d), "p_partkey", bcast = true))
      .unionAll(edge("lineitem->supplier", li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey", bcast = true))
      .unionAll(edge("orders->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey", bcast = true))
  }
  private val q233Sql =
    """SELECT 'lineitem->orders' AS edge,
      |  (SELECT COUNT(*) FROM lineitem) AS n_child,
      |  (SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
      |    AS n_orphans,
      |  ROUND(CAST((SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
      |    AS DOUBLE) / CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE),
      |    6) AS orphan_rate
      |UNION ALL
      |SELECT 'lineitem->part',
      |  (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM part WHERE p_partkey = l_partkey)),
      |  ROUND(CAST((SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM part WHERE p_partkey = l_partkey)) AS DOUBLE)
      |    / CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE), 6)
      |UNION ALL
      |SELECT 'lineitem->supplier',
      |  (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)),
      |  ROUND(CAST((SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey))
      |    AS DOUBLE) / CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE),
      |    6)
      |UNION ALL
      |SELECT 'orders->customer',
      |  (SELECT COUNT(*) FROM orders),
      |  (SELECT COUNT(*) FROM orders WHERE NOT EXISTS
      |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
      |  ROUND(CAST((SELECT COUNT(*) FROM orders WHERE NOT EXISTS
      |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
      |    AS DOUBLE) / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE),
      |    6)""".stripMargin

  /** q234: MAXIMUM DRAWDOWN of the monthly revenue series — running
    * peak, per-month drawdown (peak−v)/peak, and the worst trough with
    * its peak month (the risk lens the volatility rows q197/q230 don't
    * give: DEPTH of decline, not spread). Scale shape: the fact
    * reduces FIRST to the month-grain decimal series (map-side
    * partials); the running max and argmax run on the ≤100-row
    * calendar table — the documented day-grain window convention.
    * Peak/value stay exact decimal; the ratio is one IEEE divide at
    * 6 dp; trough argmax tiebreaks on month. Hash-exact. */
  private val q234: QFn = (s, d) => {
    val monthly = Tables.lineitem(s, d)
      .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM")
        .as("month"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(Dec)).as("rev"))
    val w = Window.orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPeak = monthly
      .withColumn("peak", max(col("rev")).over(w))
      .withColumn("peak_month",
        max(struct(col("rev"), col("month"))).over(w).getField("month"))
      .withColumn("dd",
        round((col("peak") - col("rev")).cast("double") /
          col("peak").cast("double"), 6))
    wPeak.orderBy(col("dd").desc, col("month").asc)
      .limit(1)
      .select(col("month").as("trough_month"), col("peak_month"),
        col("rev").cast("double").as("trough_rev"),
        col("peak").cast("double").as("peak_rev"),
        col("dd").as("max_drawdown"))
  }
  private val q234Sql =
    """WITH monthly AS (
      |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
      |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
      |      AS rev
      |  FROM lineitem GROUP BY 1),
      |peaks AS (
      |  SELECT month, rev,
      |    MAX(rev) OVER w AS peak,
      |    MAX({'rev': rev, 'month': month}) OVER w AS peak_row
      |  FROM monthly
      |  WINDOW w AS (ORDER BY month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT month AS trough_month,
      |  peak_row.month AS peak_month,
      |  CAST(rev AS DOUBLE) AS trough_rev,
      |  CAST(peak AS DOUBLE) AS peak_rev,
      |  ROUND(CAST(peak - rev AS DOUBLE) / CAST(peak AS DOUBLE), 6)
      |    AS max_drawdown
      |FROM peaks
      |ORDER BY ROUND(CAST(peak - rev AS DOUBLE) / CAST(peak AS DOUBLE),
      |  6) DESC, month ASC
      |LIMIT 1""".stripMargin

  /** q235: COHORT LTV CURVE — average cumulative revenue per customer
    * by months-since-first-order, per acquisition cohort (the growth
    * metric next to q89's retention counts: how much VALUE a cohort
    * accrues as it ages). Scale shape: one customer-keyed min
    * aggregate (cohort assignment) shuffle-joined back on the same
    * key, one (cohort, offset) decimal aggregate with map-side
    * partials, then the cumulative sum runs on the cohort-keyed
    * calendar-bounded table (≤ months² rows at any data size). Month
    * arithmetic on exact ints (y·12+m); cum revenue exact decimal →
    * double; LTV one IEEE divide at 6 dp. Hash-exact. */
  private val q235: QFn = (s, d) => {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      (year(to_date(col("o_orderdate"))) * 12 +
        month(to_date(col("o_orderdate"))) - 1).as("mnum"),
      col("o_totalprice"))
    val cohort = o.groupBy("o_custkey").agg(min(col("mnum")).as("c0"))
    val cohortSize = cohort.groupBy(col("c0")).agg(
      count(lit(1)).as("n_customers"))
    val cell = o.join(cohort, Seq("o_custkey"))
      .groupBy(col("c0"), (col("mnum") - col("c0")).as("offset"))
      .agg(sum(col("o_totalprice").cast(Dec)).as("rev"))
    val wCum = Window.partitionBy("c0").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell.join(broadcast(cohortSize), Seq("c0"))
      .withColumn("cum_rev", sum(col("rev")).over(wCum))
      .select(
        format_string("%04d-%02d", expr("c0 div 12"),
          col("c0") % 12 + 1).as("cohort"),
        col("offset"), col("n_customers"),
        col("rev").cast("double").as("rev"),
        col("cum_rev").cast("double").as("cum_rev"),
        round(col("cum_rev").cast("double") /
          col("n_customers").cast("double"), 6).as("ltv"))
  }
  private val q235Sql =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) * 12
      |      + EXTRACT(month FROM CAST(o_orderdate AS DATE)) - 1 AS INT)
      |      AS mnum,
      |    o_totalprice
      |  FROM orders),
      |cohort AS (
      |  SELECT o_custkey, MIN(mnum) AS c0 FROM o GROUP BY 1),
      |sz AS (
      |  SELECT c0, CAST(COUNT(*) AS BIGINT) AS n_customers
      |  FROM cohort GROUP BY 1),
      |cell AS (
      |  SELECT c0, mnum - c0 AS "offset",
      |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
      |  FROM o JOIN cohort USING (o_custkey)
      |  GROUP BY 1, 2)
      |SELECT printf('%04d-%02d', c0 // 12, c0 % 12 + 1) AS cohort,
      |  "offset", n_customers,
      |  CAST(rev AS DOUBLE) AS rev,
      |  CAST(SUM(rev) OVER (PARTITION BY c0 ORDER BY "offset"
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS cum_rev,
      |  ROUND(CAST(SUM(rev) OVER (PARTITION BY c0 ORDER BY "offset"
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(n_customers AS DOUBLE), 6) AS ltv
      |FROM cell JOIN sz USING (c0)""".stripMargin

  /** q237: ABC CLASSIFICATION of parts by traded value (A = parts
    * covering the first 80% of cumulative revenue, B = next 15%,
    * C = tail — the inventory-control standard): per-class part
    * count, revenue, and share. Scale shape: the per-part aggregate
    * is map-side-partial; the global revenue ORDERING runs through
    * `RankOps.withGlobalRank` (range-repartition + two-pass
    * zipWithIndex — the q63 discipline, no single-reducer window) and
    * the cumulative revenue through `RankOps.withGroupedPrefixSum`
    * on exact integer micros (headroom to ~9·10¹⁸ µ$ ≈ $9T per
    * class boundary check — a decimal(38) prefix fold is the declared
    * upgrade past that); class boundaries compare exact integers
    * (20·cum ≤ 16·total, 20·cum ≤ 19·total), never float shares.
    * Hash-exact. */
  private val q237: QFn = (s, d) => {
    val per = Tables.lineitem(s, d)
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(Dec)).as("rev"))
      .withColumn("rev_u", (col("rev") * 1000000L).cast("long"))
    val ranked = RankOps.withGlobalRank(per,
      Seq(col("rev").desc, col("l_partkey").asc), "rk")
    val withCum = RankOps.withGroupedPrefixSum(
        ranked.withColumn("g", lit(1)), Seq("g"), Seq("rk"),
        valueCol = "rev_u", sumCol = "cum0")
      .withColumn("cum_u", col("cum0") + col("rev_u"))
    val total = per.agg(sum(col("rev_u")).as("total_u"))
    withCum.crossJoin(broadcast(total))
      .withColumn("cls",
        when(col("cum_u") * 20 <= col("total_u") * 16, "A")
          .when(col("cum_u") * 20 <= col("total_u") * 19, "B")
          .otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev")).cast("double").as("revenue"),
        round((sum(col("rev_u")).cast("double") /
          min(col("total_u")).cast("double")), 6).as("rev_share"))
      .orderBy("cls")
  }
  private val q237Sql =
    """WITH per AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
      |      AS rev
      |  FROM lineitem GROUP BY 1),
      |ranked AS (
      |  SELECT rev, CAST(rev * 1000000 AS BIGINT) AS rev_u,
      |    SUM(CAST(rev * 1000000 AS BIGINT)) OVER (
      |      ORDER BY rev DESC, l_partkey ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u
      |  FROM per),
      |tot AS (SELECT SUM(rev_u) AS total_u FROM ranked)
      |SELECT CASE WHEN cum_u * 20 <= total_u * 16 THEN 'A'
      |  WHEN cum_u * 20 <= total_u * 19 THEN 'B' ELSE 'C' END AS cls,
      |  CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(rev) AS DOUBLE) AS revenue,
      |  ROUND(CAST(SUM(rev_u) AS DOUBLE) / CAST(MIN(total_u) AS DOUBLE),
      |    6) AS rev_share
      |FROM ranked, tot
      |GROUP BY 1 ORDER BY cls""".stripMargin

  /** q240: PRICE-JUMP DETECTION — parts whose average monthly unit
    * price moved > 25% month-over-month (the pricing-anomaly /
    * catalog-error screen): per (part, month) average unit price,
    * lag against the part's PREVIOUS OBSERVED month, top-20 jumps.
    * Scale shape: one fact-sized (part, month) aggregate with
    * map-side partials, then the lag window keyed on l_partkey —
    * partition-parallel at any part count — and a bounded top-k.
    * Unit price = exact-decimal net revenue / exact-decimal quantity
    * as ONE IEEE divide (never decimal/decimal division — engines
    * disagree on result scale); jump likewise one IEEE expression
    * over those doubles; rounding only at the output. Hash-exact. */
  private val q240: QFn = (s, d) => {
    val pm = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"),
        date_format(to_date(col("l_shipdate")), "yyyy-MM").as("month"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(Dec)).as("net"),
        sum(col("l_quantity").cast(Dec)).as("qty"))
      .withColumn("ap", col("net").cast("double") / col("qty").cast("double"))
    val w = Window.partitionBy("l_partkey").orderBy("month")
    pm.withColumn("prev_month", lag(col("month"), 1).over(w))
      .withColumn("prev_ap", lag(col("ap"), 1).over(w))
      .filter(col("prev_ap").isNotNull && col("prev_ap") > 0)
      .withColumn("jump",
        (col("ap") - col("prev_ap")) / col("prev_ap"))
      .filter(abs(col("jump")) > 0.25)
      .select(col("l_partkey"), col("prev_month"), col("month"),
        round(col("prev_ap"), 6).as("prev_price"),
        round(col("ap"), 6).as("price"),
        round(col("jump"), 6).as("jump"))
      .orderBy(abs(col("jump")).desc, col("l_partkey").asc,
        col("month").asc)
      .limit(20)
  }
  private val q240Sql =
    """WITH pm AS (
      |  SELECT l_partkey,
      |    strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,6))) AS DOUBLE)
      |      / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
      |      AS ap
      |  FROM lineitem GROUP BY 1, 2),
      |lagged AS (
      |  SELECT l_partkey, month, ap,
      |    LAG(month) OVER (PARTITION BY l_partkey ORDER BY month)
      |      AS prev_month,
      |    LAG(ap) OVER (PARTITION BY l_partkey ORDER BY month)
      |      AS prev_ap
      |  FROM pm)
      |SELECT l_partkey, prev_month, month,
      |  ROUND(prev_ap, 6) AS prev_price,
      |  ROUND(ap, 6) AS price,
      |  ROUND((ap - prev_ap) / prev_ap, 6) AS jump
      |FROM lagged
      |WHERE prev_ap IS NOT NULL AND prev_ap > 0
      |  AND ABS((ap - prev_ap) / prev_ap) > 0.25
      |ORDER BY ABS((ap - prev_ap) / prev_ap) DESC, l_partkey ASC,
      |  month ASC
      |LIMIT 20""".stripMargin

  /** q244: YEAR-OVER-YEAR GROWTH screen — top-20 parts by revenue
    * growth ratio between 1996 and 1997 (the "trending items" lens
    * none of the trend tests give: per-ENTITY growth ranking, not a
    * series statistic). Scale shape: one (part, year) map-side-partial
    * aggregate, the two year slices self-join CO-PARTITIONED on the
    * part key (no broadcast assumption — both sides are part-sized),
    * one IEEE ratio, bounded top-k with part tiebreak. A 50-unit
    * decimal revenue floor on the base year keeps noise ratios out
    * (and the floor compares EXACT decimals, not floats). Hash-exact. */
  private val q244: QFn = (s, d) => {
    val py = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"),
        year(to_date(col("l_shipdate"))).as("yr"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(Dec)).as("rev"))
    val a = py.filter(col("yr") === 1996)
      .select(col("l_partkey"), col("rev").as("rev_a"))
    val b = py.filter(col("yr") === 1997)
      .select(col("l_partkey"), col("rev").as("rev_b"))
    a.join(b, Seq("l_partkey"))
      .filter(col("rev_a") >= lit(50).cast(Dec))
      .select(col("l_partkey"),
        col("rev_a").cast("double").as("rev_1996"),
        col("rev_b").cast("double").as("rev_1997"),
        round(col("rev_b").cast("double") / col("rev_a").cast("double"),
          6).as("growth"))
      .orderBy(col("growth").desc, col("l_partkey").asc)
      .limit(20)
  }
  private val q244Sql =
    """WITH py AS (
      |  SELECT l_partkey,
      |    CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)
      |      AS yr,
      |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
      |      AS rev
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT a.l_partkey,
      |  CAST(a.rev AS DOUBLE) AS rev_1996,
      |  CAST(b.rev AS DOUBLE) AS rev_1997,
      |  ROUND(CAST(b.rev AS DOUBLE) / CAST(a.rev AS DOUBLE), 6)
      |    AS growth
      |FROM py a JOIN py b ON a.l_partkey = b.l_partkey
      |WHERE a.yr = 1996 AND b.yr = 1997
      |  AND a.rev >= CAST(50 AS DECIMAL(28,6))
      |ORDER BY growth DESC, a.l_partkey ASC
      |LIMIT 20""".stripMargin

  /** q245: ORDER FILL RATE — per order priority, the share of orders
    * whose EVERY line shipped within 30 days of the order date (the
    * "for all lines" SLA next to q208's last-line cycle time and
    * q232's quarter division). Scale shape: one order-keyed max
    * aggregate over the fact-fact join (co-partitioned on the order
    * key), then a priority-sized conditional rollup. Exact integer
    * day arithmetic; one IEEE rate at 6 dp. Hash-exact. */
  private val q245: QFn = (s, d) => {
    val per = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(max(datediff(to_date(col("l_shipdate")),
        to_date(col("o_orderdate")))).as("worst_delay"))
    per.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("worst_delay") <= 30, 1L).otherwise(0L))
          .as("n_filled_30d"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_filled_30d"),
        round(col("n_filled_30d").cast("double") /
          col("n_orders").cast("double"), 6).as("fill_rate"))
      .orderBy("o_orderpriority")
  }
  private val q245Sql =
    """WITH per AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    MAX(datediff('day', CAST(o_orderdate AS DATE),
      |      CAST(l_shipdate AS DATE))) AS worst_delay
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN worst_delay <= 30 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_filled_30d,
      |  ROUND(CAST(SUM(CASE WHEN worst_delay <= 30 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS fill_rate
      |FROM per GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** q247: SEASONAL-NAIVE FORECAST BACKTEST — score the standard
    * baseline forecaster (predict month m with the value at m−12) on
    * monthly revenue per nation, reporting MAPE and bias (the
    * forecast-quality category none of the trend/seasonality tests
    * cover; every real forecaster must beat exactly this number).
    * Scale shape: fact reduces FIRST to the (nation, month) decimal
    * series; the prediction join is a CALENDAR-BOUNDED self-join on
    * (nation, month−12); per-month absolute percentage errors round
    * to 6 dp and fold through the exact decimal accumulator. One
    * IEEE divide per output. Hash-exact. */
  private val q247: QFn = (s, d) => {
    val nm = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"),
        (year(to_date(col("l_shipdate"))) * 12 +
          month(to_date(col("l_shipdate"))) - 1).as("mnum"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(Dec)).as("rev"))
    val pred = nm.select(col("nation"),
      (col("mnum") + 12).as("mnum"), col("rev").as("pred"))
    nm.join(pred, Seq("nation", "mnum"))
      .filter(col("rev") > 0)
      .select(col("nation"),
        round(abs(col("rev") - col("pred")).cast("double") /
          col("rev").cast("double"), 6).as("ape"),
        ((col("pred") - col("rev")).cast("double")).as("err"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n_months"),
        round(dsum(col("ape")) / count(lit(1)), 6).as("mape"),
        round(dsum(col("err")) / count(lit(1)), 6).as("mean_bias"))
      .orderBy("nation")
  }
  private val q247Sql =
    s"""WITH nm AS (
       |  SELECT n_name AS nation,
       |    CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) * 12
       |      + EXTRACT(month FROM CAST(l_shipdate AS DATE)) - 1 AS INT)
       |      AS mnum,
       |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
       |      AS rev
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT a.nation,
       |    ROUND(CAST(ABS(a.rev - p.rev) AS DOUBLE)
       |      / CAST(a.rev AS DOUBLE), 6) AS ape,
       |    CAST(p.rev - a.rev AS DOUBLE) AS err
       |  FROM nm a JOIN nm p
       |    ON a.nation = p.nation AND p.mnum = a.mnum - 12
       |  WHERE a.rev > 0)
       |SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_months,
       |  ROUND(${sqlSum("ape")} / COUNT(*), 6) AS mape,
       |  ROUND(${sqlSum("err")} / COUNT(*), 6) AS mean_bias
       |FROM j GROUP BY 1 ORDER BY nation""".stripMargin

  /** q248: ROLLING-BASELINE ANOMALY DAYS — top-5 days by |z| of daily
    * revenue against the TRAILING 28-day mean/std (excluding the day
    * itself): the ops-monitoring shape next to q211's in-month Tukey
    * fence (a fixed-window robust fence) and q104's global MAD — this
    * one scores each day against its own recent past, so a slow drift
    * never poisons the baseline. Scale shape: the fact reduces FIRST
    * to the day-grain series; the rolling window runs on the
    * calendar-sized table (documented day-grain convention). All
    * window inputs are EXACT integers (revenue micros as long; squares
    * in DECIMAL(38,0) micro² — rev² passes 2⁶³): mean/var/z are then
    * fixed IEEE expressions over identical exact operands in both
    * engines. ≥14 prior days and positive variance required;
    * deterministic day tiebreak. Hash-exact. */
  private val q248: QFn = (s, d) => {
    val daily = Tables.lineitem(s, d)
      .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM-dd")
        .as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(Dec)) * 1000000L).cast("long").as("rev_u"))
    val w = Window.orderBy("day").rowsBetween(-28, -1)
    val scored = daily
      .withColumn("n_prior", count(col("rev_u")).over(w))
      .withColumn("sum_u", sum(col("rev_u")).over(w))
      .withColumn("sumsq",
        sum(col("rev_u").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("rev_u")).over(w))
      .filter(col("n_prior") >= 14)
      .withColumn("mean_u", col("sum_u").cast("double") /
        col("n_prior").cast("double"))
      .withColumn("var_u",
        (col("sumsq").cast("double") - col("n_prior").cast("double") *
          col("mean_u") * col("mean_u")) /
          (col("n_prior").cast("double") - 1.0))
      .filter(col("var_u") > 0)
      .withColumn("z",
        (col("rev_u").cast("double") - col("mean_u")) / sqrt(col("var_u")))
    // order on the UNROUNDED z (matching the oracle's ORDER BY), round
    // only the output columns
    scored.orderBy(abs(col("z")).desc, col("day").asc)
      .limit(5)
      .select(col("day"),
        round(col("rev_u").cast("double") / 1e6, 6).as("revenue"),
        round(col("mean_u") / 1e6, 6).as("mean_28d"),
        round(col("z"), 6).as("z"))
  }
  private val q248Sql =
    """WITH daily AS (
      |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS day,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS rev_u
      |  FROM lineitem GROUP BY 1),
      |rolled AS (
      |  SELECT day, rev_u,
      |    COUNT(rev_u) OVER w AS n_prior,
      |    CAST(SUM(rev_u) OVER w AS BIGINT) AS sum_u,
      |    SUM(CAST(rev_u AS DECIMAL(38,0)) * rev_u) OVER w AS sumsq
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 28 PRECEDING
      |    AND 1 PRECEDING)),
      |scored AS (
      |  SELECT day, rev_u,
      |    CAST(sum_u AS DOUBLE) / CAST(n_prior AS DOUBLE) AS mean_u,
      |    (CAST(sumsq AS DOUBLE) - CAST(n_prior AS DOUBLE)
      |      * (CAST(sum_u AS DOUBLE) / CAST(n_prior AS DOUBLE))
      |      * (CAST(sum_u AS DOUBLE) / CAST(n_prior AS DOUBLE)))
      |      / (CAST(n_prior AS DOUBLE) - 1.0) AS var_u
      |  FROM rolled WHERE n_prior >= 14)
      |SELECT day,
      |  ROUND(CAST(rev_u AS DOUBLE) / 1e6, 6) AS revenue,
      |  ROUND(mean_u / 1e6, 6) AS mean_28d,
      |  ROUND((CAST(rev_u AS DOUBLE) - mean_u) / SQRT(var_u), 6) AS z
      |FROM scored WHERE var_u > 0
      |ORDER BY ABS((CAST(rev_u AS DOUBLE) - mean_u) / SQRT(var_u)) DESC,
      |  day ASC
      |LIMIT 5""".stripMargin

  /** q249: RATIO-TO-PARENT rollup — each nation's revenue as a share
    * of its region and of the world (the percent-of-total BI shape —
    * `RATIO_TO_REPORT` in warehouse dialects — that q221's time-trend
    * and q119's single-market share don't give). Scale shape: ONE
    * fact-sized (nationkey) aggregate with map-side partials; region
    * and grand totals re-aggregate the 25-row nation table and join
    * back broadcast. Exact-decimal revenue everywhere; two IEEE
    * ratios at 6 dp. Hash-exact. */
  private val q249: QFn = (s, d) => {
    val byNation = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(Dec)).as("rev"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("rev"))
    val regTot = byNation.groupBy("region")
      .agg(sum(col("rev")).as("reg_rev"))
    val world = byNation.agg(sum(col("rev")).as("world_rev"))
    byNation.join(broadcast(regTot), Seq("region"))
      .crossJoin(broadcast(world))
      .select(col("region"), col("nation"),
        col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") /
          col("reg_rev").cast("double"), 6).as("share_of_region"),
        round(col("rev").cast("double") /
          col("world_rev").cast("double"), 6).as("share_of_world"))
      .orderBy("region", "nation")
  }
  private val q249Sql =
    """WITH bn AS (
      |  SELECT r_name AS region, n_name AS nation,
      |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
      |      AS rev
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |rt AS (SELECT region, SUM(rev) AS reg_rev FROM bn GROUP BY 1),
      |w AS (SELECT SUM(rev) AS world_rev FROM bn)
      |SELECT region, nation, CAST(rev AS DOUBLE) AS revenue,
      |  ROUND(CAST(rev AS DOUBLE) / CAST(reg_rev AS DOUBLE), 6)
      |    AS share_of_region,
      |  ROUND(CAST(rev AS DOUBLE) / CAST(world_rev AS DOUBLE), 6)
      |    AS share_of_world
      |FROM bn JOIN rt USING (region), w
      |ORDER BY region, nation""".stripMargin

  /** q250: FIRST-vs-LAST ORDER TRAJECTORY per market segment — for
    * every repeat customer, the ratio of their LAST order's value to
    * their FIRST's (deterministic argmin/argmax via (date, orderkey)
    * struct extrema — no per-customer window), rolled up per segment
    * as mean ratio and the share of customers trading up (the
    * growth-vs-churn trajectory lens next to q228's reactivation and
    * q110's RFM snapshot). Scale shape: one customer-keyed struct
    * min/max aggregate, segment dim broadcast, segment-sized rollup;
    * ratios 6-dp into the exact decimal fold. Hash-exact. */
  private val q250: QFn = (s, d) => {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      struct(to_date(col("o_orderdate")).as("od"),
        col("o_orderkey").as("ok"),
        col("o_totalprice").as("v")).as("st"))
    val per = o.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        min(col("st")).as("first"), max(col("st")).as("last"))
      .filter(col("n_orders") >= 2)
      .select(col("o_custkey"),
        round(col("last.v").cast("double") /
          col("first.v").cast("double"), 6).as("ratio"))
    per.join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_repeat_customers"),
        round(dsum(col("ratio")) / count(lit(1)), 6).as("mean_ratio"),
        round(sum(when(col("ratio") > 1.0, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("share_trading_up"))
      .orderBy("c_mktsegment")
  }
  private val q250Sql =
    s"""WITH per AS (
       |  SELECT o_custkey,
       |    COUNT(*) AS n_orders,
       |    MIN({'od': CAST(o_orderdate AS DATE), 'ok': o_orderkey,
       |      'v': o_totalprice}) AS fst,
       |    MAX({'od': CAST(o_orderdate AS DATE), 'ok': o_orderkey,
       |      'v': o_totalprice}) AS lst
       |  FROM orders GROUP BY 1),
       |r AS (
       |  SELECT o_custkey,
       |    ROUND(CAST(lst.v AS DOUBLE) / CAST(fst.v AS DOUBLE), 6)
       |      AS ratio
       |  FROM per WHERE n_orders >= 2)
       |SELECT c_mktsegment,
       |  CAST(COUNT(*) AS BIGINT) AS n_repeat_customers,
       |  ROUND(${sqlSum("ratio")} / COUNT(*), 6) AS mean_ratio,
       |  ROUND(CAST(SUM(CASE WHEN ratio > 1.0 THEN 1 ELSE 0 END)
       |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS share_trading_up
       |FROM r JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  /** q252: MEDIAN INTER-ORDER GAP per market segment — the repeat-
    * purchase cadence lens (q236 profiles event interarrivals
    * globally; this is the exact grouped median of a PER-CUSTOMER
    * derived series). Scale shape: the lag window partitions by
    * customer (bounded by orders-per-customer), then the grouped
    * exact median runs on the RankOps prefix-sum path — no segment
    * ever buffers its gaps in one reducer — with interpolation
    * arithmetic bit-identical to `quantile_cont`. Hash-exact. */
  private val q252: QFn = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("od").asc, col("o_orderkey").asc)
    val gaps = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"))
      .withColumn("prev", lag(col("od"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap", datediff(col("od"), col("prev")).cast("double"))
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val med = RankOps.groupedPercentiles(gaps, "c_mktsegment", "gap",
      Seq("o_custkey", "o_orderkey"), Seq(0.5))
    val counts = gaps.groupBy(col("c_mktsegment").as("g"))
      .agg(count(lit(1)).as("n_gaps"))
    med.join(counts, Seq("g"))
      .select(col("g").as("c_mktsegment"),
        round(col("pv"), 6).as("median_gap_days"), col("n_gaps"))
      .orderBy("c_mktsegment")
  }
  private val q252Sql =
    """WITH gaps AS (
      |  SELECT c_mktsegment,
      |    date_diff('day',
      |      LAG(CAST(o_orderdate AS DATE)) OVER
      |        (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey),
      |      CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT c_mktsegment,
      |  ROUND(quantile_cont(CAST(gap AS DOUBLE), 0.5), 6)
      |    AS median_gap_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_gaps
      |FROM gaps WHERE gap IS NOT NULL
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  /** q254: SHIP-DELAY QUINTILE BANDS — global exact P20/P40/P60/P80
    * breaks of the order→ship delay, then per-band volume and value
    * (the "histogram by quantile breaks" profile a latency SLA review
    * reads; fixed-width bins would hide the tail). Scale shape: one
    * fact-fact shuffle join, breaks via the ungrouped RankOps
    * prefix-sum percentiles (no single-reducer sort), banding is a
    * 1-row broadcast cross + CASE, rollup is 5 rows. Hash-exact. */
  private val q254: QFn = (s, d) => {
    val dl = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        col("l_extendedprice"), to_date(col("l_shipdate")).as("sd"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay", datediff(col("sd"), col("od")).cast("double"))
    // r13 rewrite: delay is WHOLE DAYS, so its distinct-value count is
    // calendar-bounded (≈120 here, never data-scaled) — ONE fact pass
    // folds the join into a delay-grain histogram carrying exactly the
    // decimal sums davg needs, and both the quantile breaks AND the
    // band rollup read the tiny histogram. The previous shape ran the
    // fact-fact join TWICE (once under the prefix-sum percentile
    // machinery, once under the banding cross) — 2 full passes + 2 RDD
    // rank passes at any scale. Value-identical (oracle-proven):
    // decimal sums re-associate exactly, and the interpolation below
    // reproduces groupedPercentiles' (v_lo + (v_hi−v_lo)·frac) doubles
    // bit-for-bit from the same order statistics.
    val hist = dl.groupBy("delay").agg(
        count(lit(1)).as("cnt"),
        sum(col("delay").cast(Dec)).as("dsum"),
        sum(col("l_extendedprice").cast(Dec)).as("psum"))
      .cutLineage()
    // exclusive cumulative count per distinct delay: the 0-based rank
    // range [cumb, cumb+cnt) this value occupies in the sorted
    // multiset (delay-grain window — the day-grain lint convention)
    val wofs = Window.orderBy(col("delay"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumh = hist.withColumn("cumb",
      coalesce(sum(col("cnt")).over(wofs), lit(0L)))
    // quantile_cont probes: h=(n−1)·p, lo=floor(h), hi=ceil(h) — the
    // exact probe table groupedPercentiles builds, on the histogram
    val probes = hist.agg(sum(col("cnt")).as("n"))
      .select(explode(array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*)).as("p"),
        col("n"))
      .withColumn("h", (col("n") - 1).cast("double") * col("p"))
      .withColumn("frac", col("h") - floor(col("h")).cast("double"))
      .select(col("p"), col("frac"), explode(array(
        struct(floor(col("h")).cast("long").as("want"), lit("lo").as("role")),
        struct(ceil(col("h")).cast("long").as("want"), lit("hi").as("role"))))
        .as("wt"))
      .select(col("p"), col("frac"),
        col("wt.want").as("want"), col("wt.role").as("role"))
    val breaks = cumh.join(broadcast(probes),
        col("want") >= col("cumb") && col("want") < col("cumb") + col("cnt"))
      .groupBy("p", "frac")
      .agg(max(when(col("role") === "lo", col("delay"))).as("v_lo"),
        max(when(col("role") === "hi", col("delay"))).as("v_hi"))
      .select(col("p"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac")).as("pv"))
      .agg(max(when(col("p") === 0.2, col("pv"))).as("b20"),
        max(when(col("p") === 0.4, col("pv"))).as("b40"),
        max(when(col("p") === 0.6, col("pv"))).as("b60"),
        max(when(col("p") === 0.8, col("pv"))).as("b80"))
    hist.crossJoin(broadcast(breaks))
      .withColumn("band",
        when(col("delay") <= col("b20"), "1_fastest")
          .when(col("delay") <= col("b40"), "2_fast")
          .when(col("delay") <= col("b60"), "3_mid")
          .when(col("delay") <= col("b80"), "4_slow")
          .otherwise("5_slowest"))
      .groupBy("band")
      .agg(sum(col("cnt")).as("n_lines"),
        round((sum(col("dsum")).cast("double") / sum(col("cnt")))
          .cast("double"), 6).as("mean_delay_days"),
        round((sum(col("psum")).cast("double") / sum(col("cnt")))
          .cast("double"), 6).as("mean_price"))
      .orderBy("band")
  }
  private val q254Sql =
    s"""WITH dl AS (
       |  SELECT l_extendedprice,
       |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
       |      CAST(l_shipdate AS DATE)) AS DOUBLE) AS delay
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |b AS (
       |  SELECT quantile_cont(delay, 0.2) AS b20,
       |    quantile_cont(delay, 0.4) AS b40,
       |    quantile_cont(delay, 0.6) AS b60,
       |    quantile_cont(delay, 0.8) AS b80
       |  FROM dl)
       |SELECT CASE
       |    WHEN delay <= b20 THEN '1_fastest'
       |    WHEN delay <= b40 THEN '2_fast'
       |    WHEN delay <= b60 THEN '3_mid'
       |    WHEN delay <= b80 THEN '4_slow'
       |    ELSE '5_slowest' END AS band,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  ROUND(${sqlAvg("delay")}, 6) AS mean_delay_days,
       |  ROUND(${sqlAvg("l_extendedprice")}, 6) AS mean_price
       |FROM dl, b
       |GROUP BY 1 ORDER BY band""".stripMargin

  /** q255: TOP-3 SUPPLIERS PER NATION WITH TIES — `rank()` (not
    * row_number) so co-leaders all surface: the tie-inclusive top-k
    * every league table needs, next to q96's arbitrary-tiebreak
    * top-k. Scale shape: one fact-sized aggregate to (nation,
    * supplier) grain, then the window partitions by nation over the
    * supplier-sized aggregate (bounded per nation); revenue is the
    * exact decimal fold so rank order is engine-identical. */
  private val q255: QFn = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
    rev.withColumn("rnk", rank().over(
        Window.partitionBy("n_name").orderBy(col("revenue").desc)))
      .filter(col("rnk") <= 3)
      .select(col("n_name").as("nation"), col("s_name").as("supplier"),
        col("revenue"), col("rnk").cast("int").as("rnk"))
  }
  private val q255Sql =
    s"""WITH rev AS (
       |  SELECT n_name AS nation, s_name AS supplier,
       |    ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT nation, supplier, revenue,
       |  CAST(rnk AS INT) AS rnk
       |FROM (SELECT *, RANK() OVER (PARTITION BY nation
       |    ORDER BY revenue DESC) AS rnk FROM rev)
       |WHERE rnk <= 3""".stripMargin

  /** q256: POWER-OF-TWO VALUE HISTOGRAM of order totals — the log2
    * bucket profile (latency/size histogram convention at scale:
    * exponentially wider bins, constant relative resolution).
    * Bucket = floor(log2(v)) computed EXACTLY as the bit length of
    * the integer part (`length(bin(x)) - 1`) — never floating log,
    * whose boundary rounding differs across engines. Map-side bucket
    * + one tiny aggregate. Hash-exact. */
  private val q256: QFn = (s, d) => {
    Tables.orders(s, d)
      .withColumn("bucket",
        (length(bin(floor(col("o_totalprice")).cast("long"))) - 1)
          .cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_value"),
        min(col("o_totalprice")).as("min_value"),
        max(col("o_totalprice")).as("max_value"))
      .orderBy("bucket")
  }
  private val q256Sql =
    s"""SELECT CAST(LENGTH(bin(CAST(FLOOR(o_totalprice) AS BIGINT))) - 1
       |    AS INT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  ${sqlSum("o_totalprice")} AS total_value,
       |  MIN(o_totalprice) AS min_value,
       |  MAX(o_totalprice) AS max_value
       |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q257: DISTINCT-COUNT ROLLUP — daily distinct active users per
    * event type WITH the per-day and grand subtotals in one pass
    * (GROUP BY ROLLUP + COUNT(DISTINCT): the Expand + two-phase
    * distinct aggregate plan, a shape none of the other grouping-set
    * queries exercise because q08/q12/q26/q60 all roll up ALGEBRAIC
    * measures — distinct counts don't re-aggregate, the engine must
    * carry the dedup through the expand). grouping_id disambiguates
    * subtotal rows. Calendar × type grain output. Hash-exact. */
  private val q257: QFn = (s, d) => {
    Tables.events(s, d)
      .select(floor(unix_micros(col("ts")) / (86400L * 1000000L))
        .cast("long").as("day"), col("event_type"), col("user_id"))
      .rollup("day", "event_type")
      .agg(grouping_id().as("gid"),
        countDistinct(col("user_id")).as("users"))
  }
  private val q257Sql =
    """SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
      |  event_type,
      |  CAST(GROUPING(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT),
      |    event_type) AS BIGINT) AS gid,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
      |FROM events
      |GROUP BY ROLLUP(1, event_type)""".stripMargin

  /** q261: PRICE-BAND MIX SHIFT — monthly revenue share of fixed
    * price bands plus the month-over-month share delta per band (the
    * mix-shift detector: a flat total can hide the catalog sliding
    * up- or down-market; q221 tracks regions, this tracks the price
    * structure itself). Scale shape: one fact-sized aggregate to
    * (month, band) grain, month totals re-aggregate the tiny grain
    * table, the lag window partitions by band over the calendar-sized
    * series. Fixed thresholds (not quantiles) so band edges are
    * engine-exact; shares rounded BEFORE differencing so the delta is
    * IEEE-deterministic. Hash-exact. */
  private val q261: QFn = (s, d) => {
    val bands = Tables.lineitem(s, d)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        when(col("l_extendedprice") < 10000.0, "1_lt10k")
          .when(col("l_extendedprice") < 50000.0, "2_10k_50k")
          .otherwise("3_ge50k").as("band"),
        col("l_extendedprice"))
      .groupBy("month", "band")
      .agg(dsum(col("l_extendedprice")).as("rev"))
    val tot = bands.groupBy("month").agg(dsum(col("rev")).as("mrev"))
    val w = Window.partitionBy("band").orderBy(col("month").asc)
    bands.join(tot, Seq("month"))
      .withColumn("share", round(col("rev") / col("mrev"), 6))
      .withColumn("mom_delta",
        round(col("share") - lag(col("share"), 1).over(w), 6))
      .select("month", "band", "share", "mom_delta")
      .orderBy("month", "band")
  }
  private val q261Sql =
    s"""WITH bands AS (
       |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
       |    CASE WHEN l_extendedprice < 10000.0 THEN '1_lt10k'
       |         WHEN l_extendedprice < 50000.0 THEN '2_10k_50k'
       |         ELSE '3_ge50k' END AS band,
       |    ${sqlSum("l_extendedprice")} AS rev
       |  FROM lineitem GROUP BY 1, 2),
       |tot AS (
       |  SELECT month, ${sqlSum("rev")} AS mrev FROM bands GROUP BY 1),
       |sh AS (
       |  SELECT bands.month, band, ROUND(rev / mrev, 6) AS share
       |  FROM bands JOIN tot ON bands.month = tot.month)
       |SELECT month, band, share,
       |  ROUND(share - LAG(share, 1) OVER
       |    (PARTITION BY band ORDER BY month), 6) AS mom_delta
       |FROM sh ORDER BY month, band""".stripMargin

  /** q262: TAIL RATIO per market segment — P99/P50 of order value
    * (tail amplification: how many medians the big orders are worth;
    * the capacity/risk lens next to q230's expected shortfall and
    * q16's plain percentiles). Scale shape: both exact percentiles
    * ride the RankOps grouped prefix-sum path (no segment buffers its
    * values), interpolation bit-identical to quantile_cont.
    * Hash-exact. */
  private val q262: QFn = (s, d) => {
    val o = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"),
        col("o_totalprice"))
    val ps = RankOps.groupedPercentiles(o, "c_mktsegment",
        "o_totalprice", Seq("o_orderkey"), Seq(0.5, 0.99))
      .groupBy("g")
      .agg(max(when(col("p") === 0.5, col("pv"))).as("p50"),
        max(when(col("p") === 0.99, col("pv"))).as("p99"))
    val counts = o.groupBy(col("c_mktsegment").as("g"))
      .agg(count(lit(1)).as("n_orders"))
    ps.join(counts, Seq("g"))
      .select(col("g").as("c_mktsegment"), col("n_orders"),
        round(col("p50"), 6).as("p50"),
        round(col("p99"), 6).as("p99"),
        round(col("p99") / col("p50"), 6).as("tail_ratio"))
      .orderBy("c_mktsegment")
  }
  private val q262Sql =
    """SELECT c_mktsegment,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99,
      |  ROUND(quantile_cont(o_totalprice, 0.99)
      |    / quantile_cont(o_totalprice, 0.5), 6) AS tail_ratio
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q261_price_band_mix" -> q261,
    "q262_tail_ratio" -> q262,
    "q252_median_gap_by_segment" -> q252,
    "q254_delay_quantile_bands" -> q254,
    "q255_topk_with_ties" -> q255,
    "q256_value_histogram_log2" -> q256,
    "q257_distinct_rollup" -> q257,
    "q249_ratio_to_parent" -> q249,
    "q250_first_last_ratio" -> q250,
    "q248_anomaly_days" -> q248,
    "q244_yoy_growth" -> q244,
    "q245_fill_rate" -> q245,
    "q247_seasonal_mape" -> q247,
    "q240_price_jumps" -> q240,
    "q232_relational_division" -> q232,
    "q233_orphan_check" -> q233,
    "q234_drawdown" -> q234,
    "q235_ltv_curve" -> q235,
    "q237_abc_classes" -> q237,
    "q229_trimmed_mean" -> q229,
    "q230_expected_shortfall" -> q230,
    "q231_annual_retention" -> q231,
    "q226_penetration_curve" -> q226,
    "q224_repeat_lag" -> q224,
    "q227_priority_transitions" -> q227,
    "q228_reactivation" -> q228,
    "q221_region_share_trend" -> q221,
    "q222_quantity_mode" -> q222,
    "q223_growth_streak" -> q223,
    "q216_mann_kendall" -> q216,
    "q218_price_index" -> q218,
    "q220_eta_seasonality" -> q220,
    "q211_outlier_days" -> q211,
    "q212_cohens_d" -> q212,
    "q214_nation_flow" -> q214,
    "q215_psi_drift" -> q215,
    "q208_cycle_time" -> q208,
    "q209_shrunk_reliability" -> q209,
    "q202_trade_balance" -> q202,
    "q204_cohens_kappa" -> q204,
    "q205_new_vs_returning" -> q205,
    "q206_hill_tail" -> q206,
    "q197_weekly_volatility" -> q197,
    "q198_purchase_rate" -> q198,
    "q199_wilson_returns" -> q199,
    "q193_jarque_bera" -> q193,
    "q186_anova_f" -> q186,
    "q187_brown_forsythe" -> q187,
    "q188_overdispersion" -> q188,
    "q189_nbinom_fit" -> q189,
    "q172_ca_trend" -> q172,
    "q173_kendall_tau" -> q173,
    "q174_open_orders" -> q174,
    "q175_runs_test" -> q175,
    "q176_theil_sen" -> q176,
    "q178_record_days" -> q178,
    "q180_gumbel_maxima" -> q180,
    "q183_price_dispersion" -> q183,
    "q184_sign_test" -> q184,
    "q185_brand_elasticity" -> q185,
    "q167_decile_migration" -> q167,
    "q168_survival_curve" -> q168,
    "q169_ols_loglog" -> q169,
    "q170_basket_jaccard" -> q170,
    "q160_cramers_v" -> q160,
    "q163_weighted_median" -> q163,
    "q164_moments" -> q164,
    "q154_priority_class" -> q154,
    "q155_spearman" -> q155,
    "q151_hhi" -> q151,
    "q153_theil" -> q153,
    "q147_seasonality" -> q147,
    "q148_changepoint" -> q148,
    "q145_ab_test" -> q145,
    "q146_revenue_lift" -> q146,
    "q144_kruskal_wallis" -> q144,
    "q139_dominant_supplier" -> q139,
    "q140_chi_square" -> q140,
    "q141_mannwhitney" -> q141,
    "q136_welch_ttest" -> q136,
    "q137_ks_test" -> q137,
    "q134_correlation" -> q134,
    "q135_autocorr" -> q135,
    "q126_big_orders" -> q126,
    "q127_returned_revenue" -> q127,
    "q128_promo_share" -> q128,
    "q129_supplier_cnt" -> q129,
    "q130_min_cost_supplier" -> q130,
    "q131_important_parts" -> q131,
    "q110_rfm" -> q110,
    "q114_unpivot" -> q114,
    "q124_benford" -> q124,
    "q125_gini" -> q125,
    "q122_product_margin" -> q122,
    "q118_nation_volume" -> q118,
    "q119_market_share" -> q119,
    "q120_order_count_dist" -> q120,
    "q121_disjunctive" -> q121,
    "q01_pricing_summary" -> q01,
    "q02_revenue_filter" -> q02,
    "q03_shipping_priority" -> q03,
    "q04_order_priority" -> q04,
    "q05_local_supplier" -> q05,
    "q06_window_rank" -> q06,
    "q07_running_total" -> q07,
    "q08_distinct_users" -> q08,
    "q09_topk_parts" -> q09,
    "q10_having" -> q10,
    "q11_case_agg" -> q11,
    "q12_rollup" -> q12,
    "q13_setops" -> q13,
    "q14_above_avg" -> q14,
    "q15_no_orders" -> q15,
    "q16_percentiles" -> q16,
    "q17_pivot" -> q17,
    "q18_monthly_revenue" -> q18,
    "q19_survey_satisfaction" -> q19,
    "q20_value_buckets" -> q20,
    "q25_small_qty_revenue" -> q25,
    "q26_cube" -> q26,
    "q27_full_outer_daily" -> q27,
    "q28_moving_avg" -> q28,
    "q29_deciles" -> q29,
    "q63_deciles_scalable" -> q63,
    "q85_percentiles_scalable" -> q85,
    "q55_string_funcs" -> q55,
    "q56_no_orders_bloom" -> q56,
    "q57_ship_delay" -> q57,
    "q60_grouping_sets" -> q60,
    "q70_sole_late_supplier" -> q70,
    "q71_idle_rich_customers" -> q71,
    "q73_top_supplier" -> q73,
    "q74_window_suite" -> q74,
    "q79_salted_join" -> q79,
    "q81_range_frame" -> q81,
    "q96_topk_per_group" -> q96,
    "q97_reorder_rate" -> q97,
    "q100_gapfill_interp" -> q100,
    "q102_association_rules" -> q102,
    "q104_mad_outliers" -> q104)

  val oracleSql: Map[String, String] = Map(
    "q261_price_band_mix" -> q261Sql,
    "q262_tail_ratio" -> q262Sql,
    "q252_median_gap_by_segment" -> q252Sql,
    "q254_delay_quantile_bands" -> q254Sql,
    "q255_topk_with_ties" -> q255Sql,
    "q256_value_histogram_log2" -> q256Sql,
    "q257_distinct_rollup" -> q257Sql,
    "q249_ratio_to_parent" -> q249Sql,
    "q250_first_last_ratio" -> q250Sql,
    "q248_anomaly_days" -> q248Sql,
    "q244_yoy_growth" -> q244Sql,
    "q245_fill_rate" -> q245Sql,
    "q247_seasonal_mape" -> q247Sql,
    "q240_price_jumps" -> q240Sql,
    "q232_relational_division" -> q232Sql,
    "q233_orphan_check" -> q233Sql,
    "q234_drawdown" -> q234Sql,
    "q235_ltv_curve" -> q235Sql,
    "q237_abc_classes" -> q237Sql,
    "q208_cycle_time" -> q208Sql,
    "q209_shrunk_reliability" -> q209Sql,
    "q229_trimmed_mean" -> q229Sql,
    "q230_expected_shortfall" -> q230Sql,
    "q231_annual_retention" -> q231Sql,
    "q226_penetration_curve" -> q226Sql,
    "q224_repeat_lag" -> q224Sql,
    "q227_priority_transitions" -> q227Sql,
    "q228_reactivation" -> q228Sql,
    "q221_region_share_trend" -> q221Sql,
    "q222_quantity_mode" -> q222Sql,
    "q223_growth_streak" -> q223Sql,
    "q216_mann_kendall" -> q216Sql,
    "q218_price_index" -> q218Sql,
    "q220_eta_seasonality" -> q220Sql,
    "q211_outlier_days" -> q211Sql,
    "q212_cohens_d" -> q212Sql,
    "q214_nation_flow" -> q214Sql,
    "q215_psi_drift" -> q215Sql,
    "q202_trade_balance" -> q202Sql,
    "q204_cohens_kappa" -> q204Sql,
    "q205_new_vs_returning" -> q205Sql,
    "q206_hill_tail" -> q206Sql,
    "q197_weekly_volatility" -> q197Sql,
    "q198_purchase_rate" -> q198Sql,
    "q199_wilson_returns" -> q199Sql,
    "q193_jarque_bera" -> q193Sql,
    "q186_anova_f" -> q186Sql,
    "q187_brown_forsythe" -> q187Sql,
    "q188_overdispersion" -> q188Sql,
    "q189_nbinom_fit" -> q189Sql,
    "q172_ca_trend" -> q172Sql,
    "q173_kendall_tau" -> q173Sql,
    "q174_open_orders" -> q174Sql,
    "q175_runs_test" -> q175Sql,
    "q176_theil_sen" -> q176Sql,
    "q178_record_days" -> q178Sql,
    "q180_gumbel_maxima" -> q180Sql,
    "q183_price_dispersion" -> q183Sql,
    "q184_sign_test" -> q184Sql,
    "q185_brand_elasticity" -> q185Sql,
    "q167_decile_migration" -> q167Sql,
    "q168_survival_curve" -> q168Sql,
    "q169_ols_loglog" -> q169Sql,
    "q170_basket_jaccard" -> q170Sql,
    "q160_cramers_v" -> q160Sql,
    "q163_weighted_median" -> q163Sql,
    "q164_moments" -> q164Sql,
    "q154_priority_class" -> q154Sql,
    "q155_spearman" -> q155Sql,
    "q151_hhi" -> q151Sql,
    "q153_theil" -> q153Sql,
    "q147_seasonality" -> q147Sql,
    "q148_changepoint" -> q148Sql,
    "q145_ab_test" -> q145Sql,
    "q146_revenue_lift" -> q146Sql,
    "q144_kruskal_wallis" -> q144Sql,
    "q139_dominant_supplier" -> q139Sql,
    "q140_chi_square" -> q140Sql,
    "q141_mannwhitney" -> q141Sql,
    "q136_welch_ttest" -> q136Sql,
    "q137_ks_test" -> q137Sql,
    "q134_correlation" -> q134Sql,
    "q135_autocorr" -> q135Sql,
    "q126_big_orders" -> q126Sql,
    "q127_returned_revenue" -> q127Sql,
    "q128_promo_share" -> q128Sql,
    "q129_supplier_cnt" -> q129Sql,
    "q130_min_cost_supplier" -> q130Sql,
    "q131_important_parts" -> q131Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_filter" -> q02Sql,
    "q03_shipping_priority" -> q03Sql,
    "q04_order_priority" -> q04Sql,
    "q05_local_supplier" -> q05Sql,
    "q06_window_rank" -> q06Sql,
    "q07_running_total" -> q07Sql,
    "q08_distinct_users" -> q08Sql,
    "q09_topk_parts" -> q09Sql,
    "q10_having" -> q10Sql,
    "q11_case_agg" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_setops" -> q13Sql,
    "q14_above_avg" -> q14Sql,
    "q15_no_orders" -> q15Sql,
    "q16_percentiles" -> q16Sql,
    "q17_pivot" -> q17Sql,
    "q18_monthly_revenue" -> q18Sql,
    "q19_survey_satisfaction" -> q19Sql,
    "q20_value_buckets" -> q20Sql,
    "q25_small_qty_revenue" -> q25Sql,
    "q26_cube" -> q26Sql,
    "q27_full_outer_daily" -> q27Sql,
    "q28_moving_avg" -> q28Sql,
    "q29_deciles" -> q29Sql,
    "q63_deciles_scalable" -> q29Sql, // identical output, shared oracle
    "q110_rfm" -> q110Sql,
    "q114_unpivot" -> q114Sql,
    "q118_nation_volume" -> q118Sql,
    "q122_product_margin" -> q122Sql,
    "q124_benford" -> q124Sql,
    "q125_gini" -> q125Sql,
    "q119_market_share" -> q119Sql,
    "q120_order_count_dist" -> q120Sql,
    "q121_disjunctive" -> q121Sql,
    "q85_percentiles_scalable" -> q16Sql, // identical output, shared oracle
    "q55_string_funcs" -> q55Sql,
    "q56_no_orders_bloom" -> q15Sql,
    "q57_ship_delay" -> q57Sql,
    "q60_grouping_sets" -> q60Sql,
    "q70_sole_late_supplier" -> q70Sql,
    "q71_idle_rich_customers" -> q71Sql,
    "q73_top_supplier" -> q73Sql,
    "q74_window_suite" -> q74Sql,
    "q79_salted_join" -> q79Sql,
    "q81_range_frame" -> q81Sql,
    "q96_topk_per_group" -> q96Sql,
    "q97_reorder_rate" -> q97Sql,
    "q100_gapfill_interp" -> q100Sql,
    "q102_association_rules" -> q102Sql,
    "q104_mad_outliers" -> q104Sql)
}
