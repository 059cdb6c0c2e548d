package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner}

/** Plan lint: the 100-TB design rules this library builds to, checkable
  * at runtime against any DataFrame BEFORE executing it (the
  * PlanAuditSpec discipline as an API). A finding is not always a bug —
  * a deliberate small-table cartesian baseline is fine — but every
  * finding is a place where a plan that works at test scale dies at
  * 1000×:
  *
  *  - `single-partition-window`: a window with no PARTITION BY sends
  *    every row to ONE task (use RankOps' two-pass schemes instead);
  *  - `cartesian`: a join with no equi-condition multiplies its
  *    inputs (broadcast-nested-loop or cartesian product — guard it
  *    behind a size dispatch like `VectorOps.cosinePairs`).
  *
  * Checks run on the analyzed/optimized logical plan — nothing
  * executes. Subqueries are walked too (Catalyst plans them as
  * separate trees hanging off expressions).
  */
object PlanLint {

  final case class Finding(kind: String, detail: String)

  def check(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.optimizedPlan
    val trees = plan +: plan.collect {
      case p => p.subqueries.map(_.asInstanceOf[logical.LogicalPlan])
    }.flatten
    trees.flatMap(lint).distinct
  }

  // ---- session-wired mode: `spark.graft.lint=true` makes the
  // ---- injected optimizer rule (GraftExtensions) record findings for
  // ---- every optimized query; drain() reads and clears them.

  private val recorded = new java.util.concurrent.ConcurrentLinkedQueue[Finding]

  private[graft] def record(fs: Seq[Finding]): Unit =
    fs.foreach { f => if (!recorded.contains(f)) recorded.add(f) }

  /** Findings recorded by the injected lint rule since the last drain. */
  def drain(): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    var f = recorded.poll()
    while (f != null) { out += f; f = recorded.poll() }
    out.toSeq
  }

  private[graft] def lint(plan: logical.LogicalPlan): Seq[Finding] =
    plan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty =>
        Finding("single-partition-window",
          s"window [${w.windowExpressions.map(_.name).mkString(", ")}] " +
            "has no PARTITION BY: all rows flow through one task")
      case j: logical.Join
          if j.condition.isEmpty &&
            (j.joinType == Inner || j.joinType == Cross ||
              j.joinType == FullOuter) =>
        Finding("cartesian",
          s"${j.joinType} join with no condition multiplies its inputs")
      case j: logical.Join if j.condition.exists(c => !hasEquiPair(j, c)) &&
          (j.joinType == Inner || j.joinType == Cross) =>
        Finding("cartesian",
          s"${j.joinType} join condition has no equality between the two " +
            "sides: plans as broadcast-nested-loop / cartesian")
    }

  /** Does the join condition contain at least one `left = right`
    * conjunct referencing both sides? (That is what lets Spark plan a
    * hash or sort-merge join instead of a nested loop.) */
  private def hasEquiPair(j: logical.Join,
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    def sidesSplit(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut)) ||
        (a.references.subsetOf(rightOut) && b.references.subsetOf(leftOut))
    cond.collect {
      case EqualTo(a, b) if sidesSplit(a, b) => true
      case EqualNullSafe(a, b) if sidesSplit(a, b) => true
    }.nonEmpty
  }
}
