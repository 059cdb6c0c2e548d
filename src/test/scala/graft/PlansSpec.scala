package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.LakehouseOps
import graft.plans.{AsOf, AsOfJoin, AsOfJoinExec}

/** Specs for the custom Catalyst plan nodes. */
class PlansSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("native as-of join output equals the composed range-join+window q24") {
    val composed = LakehouseOps.queries("q24_asof_join")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val native = LakehouseOps.queries("q48_asof_native")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("as-of join plans one AsOfJoinExec and at most one exchange per side") {
    val df = LakehouseOps.queries("q48_asof_native")(spark, sfDir)
    df.count() // force AQE final plan
    val plan = executed(df)
    assert(plan.collect { case e: AsOfJoinExec => e }.size == 1, plan.toString)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2, plan.toString)
  }

  test("left-only filters push below the as-of join") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val joined = AsOf.join(ev, o, col("user_id"), col("o_custkey"),
      col("ts"), col("o_orderdate").cast("timestamp"), Some(col("o_orderkey")))
      .filter(col("user_id") < 100)
    val optimized = joined.queryExecution.optimizedPlan
    // after pushdown the as-of node must be the top operator (no
    // Filter above it) and the predicate must live in its left subtree
    val asOf = optimized.collect { case a: AsOfJoin => a }
    assert(asOf.size == 1)
    assert(optimized.isInstanceOf[AsOfJoin], optimized.nodeName)
    val leftHasFilter = asOf.head.left.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.nonEmpty
    assert(leftHasFilter, optimized.treeString)
    // and the result is the filtered subset of the unfiltered join
    val full = AsOf.join(ev, o, col("user_id"), col("o_custkey"),
      col("ts"), col("o_orderdate").cast("timestamp"), Some(col("o_orderkey")))
      .collect().filter(_.getAs[Long]("user_id") < 100).map(_.toString).sorted.toSeq
    assert(joined.collect().map(_.toString).sorted.toSeq == full)
  }

  test("as-of join: unmatched left rows null-extend") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 5L), (2L, 7L), (3L, 9L))
      .toDF("k", "t")
    val r = Seq((1L, 6L, "a"), (1L, 9L, "b"), (1L, 12L, "c"), (2L, 8L, "d"))
      .toDF("rk", "rt", "v")
    val out = AsOf.join(l, r, col("k"), col("rk"), col("t"), col("rt"))
      .select("k", "t", "rt", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) "" else r.getString(3))).toSet
    assert(out == Set(
      (1L, 10L, 9L, "b"),  // latest rt <= 10 is 9
      (1L, 5L, -1L, ""),   // no rt <= 5
      (2L, 7L, -1L, ""),   // rt=8 > 7
      (3L, 9L, -1L, "")))  // key absent on the right
  }

  test("ASOF JOIN SQL syntax plans the native operator and matches q24") {
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"))
      .createOrReplaceTempView("asof_ev")
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .createOrReplaceTempView("asof_od")
    val df = spark.sql(
      """SELECT event_id, user_id, o_orderkey, o_orderdate
        |FROM asof_ev
        |ASOF JOIN asof_od
        |  ON user_id = o_custkey
        | AND CAST(o_orderdate AS TIMESTAMP) <= ts
        |""".stripMargin)
    assert(df.queryExecution.optimizedPlan.collect {
      case a: AsOfJoin => a
    }.size == 1, df.queryExecution.optimizedPlan.treeString)
    // SQL form has no tiebreak: compare on the time-only projection
    // against the composed q24 (same key+time, max orderdate; orderkey
    // may differ on date ties, so compare (event, date) pairs)
    val viaSql = df.select("event_id", "o_orderdate").collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)))).sorted.toSeq
    val composed = graft.operators.LakehouseOps.queries("q24_asof_join")(
      spark, sfDir).select(col("event_id"), col("asof_orderdate")).collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)))).sorted.toSeq
    assert(viaSql.size == composed.size)
  }

  test("as-of join tiebreak picks the greatest tiebreak at equal times") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 1L), (1L, 10L, 3L), (1L, 10L, 2L)).toDF("rk", "rt", "tb")
    val out = AsOf.join(l, r, col("k"), col("rk"), col("t"), col("rt"),
      Some(col("tb"))).select("tb").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("FORWARD as-of: smallest (time, tiebreak) at-or-after; tolerance " +
      "null-extends far matches; SQL side-swap spells forward") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 30L), (2L, 5L)).toDF("k", "t")
    val r = Seq((1L, 10L, 7L), (1L, 10L, 4L), (1L, 15L, 9L), (2L, 50L, 1L))
      .toDF("rk", "rt", "tb")
    // forward: k=1,t=10 → rt=10 smallest tiebreak (4); k=1,t=30 → none
    // at-or-after; k=2,t=5 → rt=50
    val fwd = AsOf.join(l, r, col("k"), col("rk"), col("t"), col("rt"),
      Some(col("tb")), forward = true)
      .select("k", "t", "tb").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(fwd == Set((1L, 10L, 4L), (1L, 30L, -1L), (2L, 5L, 1L)), fwd)
    // tolerance 20: k=2,t=5 → rt=50 is 45 away → null-extends
    val tol = AsOf.join(l, r, col("k"), col("rk"), col("t"), col("rt"),
      Some(col("tb")), forward = true, tolerance = Some(20L))
      .select("k", "t", "tb").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(tol == Set((1L, 10L, 4L), (1L, 30L, -1L), (2L, 5L, -1L)), tol)
    // SQL: writing `leftTime <= rightTime` (sides swapped vs the
    // backward form) resolves to a FORWARD as-of join
    l.createOrReplaceTempView("asof_fwd_l")
    r.createOrReplaceTempView("asof_fwd_r")
    val viaSql = spark.sql(
      """SELECT k, t, rt FROM asof_fwd_l
        |ASOF JOIN asof_fwd_r ON k = rk AND t <= rt
        |""".stripMargin).collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(viaSql == Set((1L, 10L, 10L), (1L, 30L, -1L), (2L, 5L, 50L)),
      viaSql)
    // SQL TOLERANCE keyword: the 20-unit bound null-extends k=2's
    // 45-away match, exactly like the DataFrame tolerance
    val viaTol = spark.sql(
      """SELECT k, t, rt FROM asof_fwd_l
        |ASOF JOIN asof_fwd_r TOLERANCE 20 ON k = rk AND t <= rt
        |""".stripMargin).collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(viaTol == Set((1L, 10L, 10L), (1L, 30L, -1L), (2L, 5L, -1L)),
      viaTol)
    // and on the BACKWARD spelling too
    val viaTolBack = spark.sql(
      """SELECT k, t, rt FROM asof_fwd_l
        |ASOF JOIN asof_fwd_r TOLERANCE 4 ON k = rk AND rt <= t
        |""".stripMargin).collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    // k=1,t=10 → rt=10 within 4; k=1,t=30 → rt=15 is 15 away → null;
    // k=2,t=5 → nothing at-or-before
    assert(viaTolBack == Set((1L, 10L, 10L), (1L, 30L, -1L),
      (2L, 5L, -1L)), viaTolBack)
    // a TOLERANCE beyond Long range parses as a Decimal literal —
    // it must FAIL LOUDLY, never silently drop the bound (ADVICE r9)
    val eTol = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT k, t, rt FROM asof_fwd_l
          |ASOF JOIN asof_fwd_r TOLERANCE 99999999999999999999999 ON
          |  k = rk AND t <= rt
          |""".stripMargin).collect()
    }
    assert(eTol.getMessage.contains("TOLERANCE"), eTol.getMessage)
    // while a Long-ranged value above Int.MaxValue still resolves
    val viaBig = spark.sql(
      """SELECT k, t, rt FROM asof_fwd_l
        |ASOF JOIN asof_fwd_r TOLERANCE 9999999999 ON k = rk AND t <= rt
        |""".stripMargin).collect()
    assert(viaBig.length == 3)
  }
}
