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
  * Semantics: for every left row, append the single right row with the
  * same key and the greatest `rightTime <= leftTime` (ties broken by
  * the greatest `tiebreak`); left rows with no qualifying right row
  * keep the left-outer null extension.
  *
  * Spark has no native as-of join; the composable workaround (range
  * join + per-left-row row_number, see LakehouseOps q24) materializes
  * EVERY (left, right-with-earlier-time) pair before discarding all
  * but one per left row — O(Σ matches) intermediate rows, quadratic in
  * the worst case. This operator instead requires both children
  * hash-clustered on the key and sorted by (key, time), then runs a
  * single O(n+m) streaming merge per partition: the planner inserts
  * exactly one exchange per side (none if the data is already
  * bucketed), and peak memory per partition is ONE buffered right row.
  * That is the shape that survives 100 TB.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tiebreak: Option[Expression]) extends BinaryNode {

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
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
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
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(lKeyExpr, leftOut)
      val lTime = BindReferences.bindReference(lTimeExpr, leftOut)
      val rKey = BindReferences.bindReference(rKeyExpr, rightOut)
      val rTime = BindReferences.bindReference(rTimeExpr, rightOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lKeyExpr.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(lTimeExpr.dataType)
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // bind against nullable-marked right attrs: the projection must
      // null-check right fields (unmatched rows carry the null row)
      val outProj = UnsafeProjection.create(
        outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))

      // Streaming state: the next unconsumed right row, plus the best
      // (latest-so-far) right row for the key currently being merged.
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var bestMatch: InternalRow = null // copied — outlives rHead reuse
      var bestKey: Any = null

      lIter.map { l =>
        val lk = lKey.eval(l)
        if (lk == null) {
          outProj(joined(l, nullRight))
        } else {
          val lt = lTime.eval(l)
          // Consume right rows that can no longer serve a later left
          // row better than they serve this one: key strictly behind,
          // or same key with time at-or-before this left row's time.
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
                rHead = if (rIter.hasNext) rIter.next() else null
              } else {
                advancing = false
              }
            }
          }
          val m =
            if (bestMatch != null && keyOrd.compare(bestKey, lk) == 0) bestMatch
            else nullRight
          outProj(joined(l, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
