package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.util.PlanLint

/** Session-wired plan lint: a non-transforming optimizer rule that
  * records [[PlanLint]] findings for every query the session
  * optimizes — the library's 100-TB plan discipline as an always-on
  * guardrail instead of a manual check. Off by default; enable with
  * `spark.graft.lint=true`. Findings surface through
  * `PlanLint.drain()` and a one-line warning in the logs.
  *
  * Injected by `GraftExtensions` (the optimizer runs rules to a fixed
  * point, so recording dedups identical findings). The rule never
  * changes the plan.
  */
case class LintRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.getOption("spark.graft.lint").contains("true")) {
      val fs = PlanLint.lint(plan)
      if (fs.nonEmpty) {
        PlanLint.record(fs)
        logWarning(s"graft lint: ${fs.map(_.kind).distinct.mkString(", ")} " +
          "— scale hazard; PlanLint.drain() has details")
      }
    }
    plan
  }
}
