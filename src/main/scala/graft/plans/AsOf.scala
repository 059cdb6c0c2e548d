package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Plans [[AsOfJoin]] logical nodes onto the streaming-merge exec.
  * The key equality may arrive either-sided (SQL form); sides are
  * fixed by reference containment. Time expressions must side
  * correctly — the inequality's direction defines the semantics. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      val (lk2, rk2) =
        if (lk.references.subsetOf(l.outputSet)) (lk, rk) else (rk, lk)
      if (!lt.references.subsetOf(l.outputSet) ||
          !rt.references.subsetOf(r.outputSet)) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            "ASOF JOIN time bound must be <rightTime> <= <leftTime>"))
      }
      AsOfJoinExec(lk2, rk2, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Pushes left-side-only filters below an as-of join. Each left row
  * produces exactly one output row, so a predicate over left columns
  * commutes with the join — filtering before the exchange shrinks the
  * shuffle instead of the result. */
object PushFilterThroughAsOf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoin)
        if cond.deterministic && cond.references.subsetOf(a.left.outputSet) =>
      a.copy(left = Filter(cond, a.left))
  }
}

/** Library entry point for the native as-of join. */
object AsOf {

  /** Ensures the planner strategy + optimizer rule are installed in
    * this session (idempotent). `spark.sql.extensions=
    * graft.functions.GraftExtensions` achieves the same at build time. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOf))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOf
  }

  /** `left ASOF JOIN right ON leftKey = rightKey AND rightTime <=
    * leftTime` keeping, per left row, the right row with the greatest
    * (rightTime, tiebreak); unmatched left rows null-extend. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      tiebreak: Option[Column] = None): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // Spark 4 Columns are lazily-analyzed column nodes; a custom node
    // never goes through the classic converters, so resolve each
    // expression via a throwaway projection over the (analyzed) child
    // and splice the resolved catalyst expression in.
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(right)
    def resolve(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        c: Column): Expression =
      Bridge.analyzed(Bridge.ofRows(spark, plan).select(c)) match {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.head match {
            case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
            case e => e
          }
        case other => throw new IllegalArgumentException(
          s"cannot resolve $c against ${other.nodeName}")
      }
    Bridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      resolve(lPlan, leftKey), resolve(rPlan, rightKey),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime),
      tiebreak.map(resolve(rPlan, _))))
  }
}
