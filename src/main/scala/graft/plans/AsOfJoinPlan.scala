package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native backward as-of join — the tier-(c) whole-operator form of
  * [[graft.operators.AsOfJoin.lookupLast]]: a custom LogicalPlan +
  * Strategy + SparkPlan instead of the union-and-window composition.
  *
  * Same contract as lookupLast: for each left row, the latest right
  * `time` at-or-before the left row's time per join key — among
  * equal-time right rows the MAX value — carried into `outAttr`
  * (null when no right row precedes). Null keys join null keys and
  * null times sort before everything, mirroring the window form's
  * partition/ordering semantics.
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * (left by (key, time), right by (key, time, value)), then ONE
  * streaming merge pass per partition — no union row inflation, no
  * window buffer, no struct-carrying of whole left rows through an
  * exchange. Each partition holds O(1) operator state (the current
  * best match as a copied one-field row), so the operator is
  * spill-free by construction at any scale; the cost is exactly the
  * two keyed exchanges + sorts the data demands.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightValue: Expression,
                        outAttr: AttributeReference)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  // outAttr is born here, not read from a child — without this the
  // analyzer's missing-attribute check rejects the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightValue: Expression,
                        outAttr: AttributeReference)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // the co-partitioning contract joins rely on: EnsureRequirements
  // aligns both children's hash partitioning (inserting exchanges as
  // needed) and the sorts below
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightValue, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val outAttrLocal = outAttr
    val (lkE, ltE) = (leftKey, leftTime)
    val (rkE, rtE, rvE) = (rightKey, rightTime, rightValue)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // nulls-first compare, matching the Ascending sort the children
      // were given (so "<= current left" consumes in sort order)
      def cmp(ord: Ordering[Any], a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
      val lk = BindReferences.bindReference(lkE, leftOutput)
      val lt = BindReferences.bindReference(ltE, leftOutput)
      val rk = BindReferences.bindReference(rkE, rightOutput)
      val rt = BindReferences.bindReference(rtE, rightOutput)
      val rvProj = UnsafeProjection.create(Seq(rvE), rightOutput)
      val rkProj = UnsafeProjection.create(Seq(rkE), rightOutput)
      val outProj = UnsafeProjection.create(output, leftOutput :+ outAttrLocal)
      val nullRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // current best match: copied one-field rows (iterator rows are
      // reused buffers) — O(1) state per partition
      var bestVal: UnsafeRow = null
      var bestKeyRow: UnsafeRow = null
      lIter.map { lrow =>
        val k = lk.eval(lrow)
        val t = lt.eval(lrow)
        var scan = true
        while (scan && rBuf.hasNext) {
          val hk = rk.eval(rBuf.head)
          val ck = cmp(keyOrd, hk, k)
          if (ck < 0) {
            // rights for keys the (ascending) left side has passed:
            // never needed again
            rBuf.next()
            bestVal = null; bestKeyRow = null
          } else if (ck == 0 && cmp(timeOrd, rt.eval(rBuf.head), t) <= 0) {
            val row = rBuf.next()
            bestVal = rvProj(row).copy()
            bestKeyRow = rkProj(row).copy()
          } else scan = false
        }
        val matched = bestVal != null &&
          cmp(keyOrd, bestKeyRow.get(0, keyType), k) == 0
        numOutputRows += 1
        outProj(joined(lrow, if (matched) bestVal else nullRow))
      }
    }
  }
}
