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
  import org.apache.spark.sql.types._

  /** Time types whose InternalRow values are integer-backed — the
    * ones tolerance arithmetic is defined over (timestamps = micros,
    * dates = days, integrals as themselves). */
  private val TolerableTimeTypes: Set[DataType] = Set(
    TimestampType, TimestampNTZType, DateType, LongType, IntegerType,
    ShortType, ByteType)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, fwd0, tol) =>
      val (lk2, rk2) =
        if (lk.references.subsetOf(l.outputSet)) (lk, rk) else (rk, lk)
      // The SQL form writes one inequality; the parser records it as
      // (leftTime, rightTime) assuming `rightTime <= leftTime`. If the
      // sides resolve SWAPPED (the user wrote `leftTime <= rightTime`),
      // swapping the expressions flips the bound's direction — the
      // SQL spelling of a FORWARD as-of join.
      val (lt2, rt2, fwd) =
        if (lt.references.subsetOf(l.outputSet) &&
            rt.references.subsetOf(r.outputSet)) (lt, rt, fwd0)
        else if (lt.references.subsetOf(r.outputSet) &&
            rt.references.subsetOf(l.outputSet)) (rt, lt, !fwd0)
        else throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            ("ASOF JOIN time bound must compare one left-side time " +
              "with one right-side time")))
      if (tol.isDefined && !TolerableTimeTypes.contains(lt2.dataType)) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            (s"ASOF JOIN tolerance requires an integer-backed time " +
              s"type (timestamp/date/integral), got ${lt2.dataType}")))
      }
      if (tol.exists(_ < 0)) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            "ASOF JOIN tolerance must be non-negative"))
      }
      AsOfJoinExec(lk2, rk2, lt2, rt2, tb, fwd, tol,
        planLater(l), planLater(r)) :: Nil
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
    * (rightTime, tiebreak); unmatched left rows null-extend.
    * `forward = true` flips the bound to `rightTime >= leftTime` and
    * keeps the SMALLEST (rightTime, tiebreak). `tolerance` (in the
    * time column's native integer units — micros for timestamps, days
    * for dates) null-extends matches farther than the bound instead —
    * pandas `merge_asof`'s direction/tolerance surface. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      tiebreak: Option[Column] = None,
      forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
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
      tiebreak.map(resolve(rPlan, _)), forward, tolerance))
  }
}
