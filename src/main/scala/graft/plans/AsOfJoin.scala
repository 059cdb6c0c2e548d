package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF join as a first-class Catalyst operator.
  *
  * Semantics (BACKWARD, the default): for every left row, append the
  * single right row with the same key and the greatest `rightTime <=
  * leftTime` (ties broken by the greatest `tiebreak`); left rows with
  * no qualifying right row keep the left-outer null extension.
  * FORWARD (`forward = true`): the single right row with the same key
  * and the SMALLEST `rightTime >= leftTime` (ties broken by the
  * smallest `tiebreak`). An optional TOLERANCE (round 9) bounds the
  * match distance in the time column's native integer units
  * (microseconds for timestamps, days for dates): a candidate farther
  * than `tolerance` null-extends instead — pandas `merge_asof`'s
  * direction/tolerance surface.
  *
  * Spark has no native as-of join; the composable workaround (range
  * join + per-left-row row_number, see LakehouseOps q24) materializes
  * EVERY (left, right-with-earlier-time) pair before discarding all
  * but one per left row — O(Σ matches) intermediate rows, quadratic in
  * the worst case. This operator instead requires both children
  * hash-clustered on the key and sorted by (key, time), then runs a
  * single O(n+m) streaming merge per partition: the planner inserts
  * exactly one exchange per side (none if the data is already
  * bucketed), and peak memory per partition is ONE buffered right row
  * in either direction. That is the shape that survives 100 TB.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tiebreak: Option[Expression],
    forward: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean =
    childrenResolved && expressions.forall(_.resolved) &&
      DataTypeUtils.sameType(leftTime.dataType, rightTime.dataType) &&
      DataTypeUtils.sameType(leftKey.dataType, rightKey.dataType)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical streaming-merge as-of join. Children arrive hash-clustered
  * on the key and sorted by (key, time[, tiebreak]) — declared through
  * `requiredChildDistribution` / `requiredChildOrdering`, so
  * EnsureRequirements plans the minimal exchanges and sorts. */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tiebreak: Option[Expression],
    forward: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    // ascending works for BOTH directions: backward consumes
    // qualifying rights (keeping the latest), forward peeks at the
    // first not-yet-qualifying one
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      tiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val fwd = forward
    val tol = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(lKeyExpr, leftOut)
      val lTime = BindReferences.bindReference(lTimeExpr, leftOut)
      val rKey = BindReferences.bindReference(rKeyExpr, rightOut)
      val rTime = BindReferences.bindReference(rTimeExpr, rightOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lKeyExpr.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(lTimeExpr.dataType)
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // tolerance arithmetic: time values are integer-backed in
      // InternalRow land (timestamps = Long micros, dates = Int days,
      // integrals as themselves) — the strategy rejects anything else
      def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()
      def withinTol(earlier: Any, later: Any): Boolean =
        tol.forall(t => asLong(later) - asLong(earlier) <= t)
      // bind against nullable-marked right attrs: the projection must
      // null-check right fields (unmatched rows carry the null row)
      val outProj = UnsafeProjection.create(
        outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))

      // Streaming state: the next unconsumed right row, plus (backward
      // only) the best (latest-so-far) right row for the current key.
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var bestMatch: InternalRow = null // copied — outlives rHead reuse
      var bestKey: Any = null
      var bestTime: Any = null

      lIter.map { l =>
        val lk = lKey.eval(l)
        if (lk == null) {
          outProj(joined(l, nullRight))
        } else {
          val lt = lTime.eval(l)
          if (!fwd) {
            // BACKWARD: consume right rows that can no longer serve a
            // later left row better than they serve this one — key
            // strictly behind, or same key with time at-or-before lt.
            var advancing = true
            while (advancing && rHead != null) {
              val rk = rKey.eval(rHead)
              if (rk == null) {
                rHead = if (rIter.hasNext) rIter.next() else null
              } else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  rHead = if (rIter.hasNext) rIter.next() else null
                } else if (c == 0 && timeOrd.compare(rTime.eval(rHead), lt) <= 0) {
                  bestMatch = rHead.copy() // sorted asc → later rows win
                  bestKey = rKey.eval(bestMatch)
                  bestTime = rTime.eval(bestMatch)
                  rHead = if (rIter.hasNext) rIter.next() else null
                } else {
                  advancing = false
                }
              }
            }
            val m =
              if (bestMatch != null && keyOrd.compare(bestKey, lk) == 0 &&
                  withinTol(bestTime, lt)) bestMatch
              else nullRight
            outProj(joined(l, m))
          } else {
            // FORWARD: consume right rows that can serve NO left row
            // from here on — key strictly behind, or same key with
            // time strictly before lt (left times only grow within a
            // key, so nothing later can want them either). The first
            // surviving row with this key is the match: smallest
            // (time, tiebreak) at-or-after lt, and it is NOT consumed
            // (the next left row of this key may match it too).
            var advancing = true
            while (advancing && rHead != null) {
              val rk = rKey.eval(rHead)
              if (rk == null) {
                rHead = if (rIter.hasNext) rIter.next() else null
              } else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0 ||
                    (c == 0 && timeOrd.compare(rTime.eval(rHead), lt) < 0)) {
                  rHead = if (rIter.hasNext) rIter.next() else null
                } else {
                  advancing = false
                }
              }
            }
            val m =
              if (rHead != null && keyOrd.compare(rKey.eval(rHead), lk) == 0 &&
                  withinTol(lt, rTime.eval(rHead))) rHead
              else nullRight
            outProj(joined(l, m))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
