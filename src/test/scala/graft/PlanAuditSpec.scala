package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import graft.operators.Relational

/** Physical-plan audits: the optimization landmarks SURVEY.md claims,
  * pinned as tests so a regression in plan shape fails loudly. */
class PlanAuditSpec extends SparkSpec {

  /** Flattens the executed plan INCLUDING the subtrees hidden inside
    * AQE query stages (QueryStageExec is a leaf wrapping its stage). */
  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // materialize so AQE settles on the final plan
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan).distinct
  }

  test("q02: all predicates push into the parquet scan; schema pruned") {
    val scan = nodes(Relational.queries("q02_revenue_filter")(spark, sfDir))
      .collectFirst { case f: FileSourceScanExec => f }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    // 4 of 11 lineitem columns read
    assert(scan.requiredSchema.fields.length == 4, scan.requiredSchema)
  }

  test("q03/q09: top-k plans TakeOrderedAndProject, not a global sort") {
    Seq("q03_shipping_priority", "q09_topk_parts").foreach { q =>
      val ns = nodes(Relational.queries(q)(spark, sfDir))
      assert(ns.exists(_.isInstanceOf[TakeOrderedAndProjectExec]), q)
    }
  }

  test("q05: all-broadcast star join with exactly one shuffle") {
    val shuffles = nodes(Relational.queries("q05_local_supplier")(spark, sfDir))
      .filter(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles.size == 1, shuffles.toString)
  }

  test("q06: rank filter plans WindowGroupLimit (per-partition top-k)") {
    val ns = nodes(Relational.queries("q06_window_rank")(spark, sfDir))
    assert(ns.exists(_.isInstanceOf[WindowGroupLimitExec]), ns.map(_.nodeName).toString)
  }
}
