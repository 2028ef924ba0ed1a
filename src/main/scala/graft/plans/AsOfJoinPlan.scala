package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — the tier-(c) whole-operator form of
  * [[graft.operators.AsOfJoin]]'s composed union+window lookups: a
  * custom LogicalPlan + Strategy + SparkPlan.
  *
  * Contract (matching the composed forms exactly):
  *  - BACKWARD (`forward = false`): per left row, the right row with
  *    the latest `time` at-or-before the left time per key; equal-time
  *    ties resolve to the LEXICOGRAPHIC MAX of `rightValues`.
  *  - FORWARD (`forward = true`): the right row with the earliest
  *    `time` at-or-after the left time; equal-time ties resolve to the
  *    lexicographic MIN of `rightValues`.
  *  - `rightValues` are carried into `outAttrs` (all null when no
  *    right row qualifies). Null keys join null keys; null times sort
  *    first — mirroring the window forms' partition/order semantics.
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * (left by (key, time), right by (key, time, values…)), then ONE
  * streaming merge pass per partition — no union row inflation, no
  * window buffer. Backward keeps the current best match as one copied
  * projected row (overwritten as rights are consumed); forward just
  * peeks the first undiscarded right. O(1) operator state per
  * partition either way — spill-free by construction at any scale; the
  * cost is exactly the two keyed exchanges + sorts the data demands.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightValues: Seq[Expression],
                        outAttrs: Seq[AttributeReference],
                        forward: Boolean)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  // outAttrs are born here, not read from a child — without this the
  // analyzer's missing-attribute check rejects the node
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rvs, outs, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rvs, outs, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightValues: Seq[Expression],
                        outAttrs: Seq[AttributeReference],
                        forward: Boolean)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // the co-partitioning contract joins rely on: EnsureRequirements
  // aligns both children's hash partitioning (inserting exchanges as
  // needed) and the sorts below
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // right ties on time break by the value tuple, ascending: backward's
  // consume-and-overwrite then lands on the max, forward's head peek
  // on the min — the composed forms' exact tie rules
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightValues.map(SortOrder(_, Ascending)))

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
    val outAttrsLocal = outAttrs
    val fwd = forward
    val (lkE, ltE) = (leftKey, leftTime)
    val (rkE, rtE, rvE) = (rightKey, rightTime, rightValues)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // nulls-first compare, matching the Ascending sorts above
      def cmp(ord: Ordering[Any], a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
      val lk = BindReferences.bindReference(lkE, leftOutput)
      val lt = BindReferences.bindReference(ltE, leftOutput)
      val rk = BindReferences.bindReference(rkE, rightOutput)
      val rt = BindReferences.bindReference(rtE, rightOutput)
      val rvProj = UnsafeProjection.create(rvE, rightOutput)
      val rkProj = UnsafeProjection.create(Seq(rkE), rightOutput)
      val outProj = UnsafeProjection.create(output, leftOutput ++ outAttrsLocal)
      val nullRow = new GenericInternalRow(outAttrsLocal.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // backward state: the current best match as copied rows (iterator
      // rows are reused buffers) — O(1) per partition
      var bestVal: UnsafeRow = null
      var bestKeyRow: UnsafeRow = null
      lIter.map { lrow =>
        val k = lk.eval(lrow)
        val t = lt.eval(lrow)
        val valRow: InternalRow =
          if (!fwd) {
            var scan = true
            while (scan && rBuf.hasNext) {
              val hk = rk.eval(rBuf.head)
              val ck = cmp(keyOrd, hk, k)
              if (ck < 0) {
                // rights for keys the (ascending) left side has passed
                rBuf.next()
                bestVal = null; bestKeyRow = null
              } else if (ck == 0 && cmp(timeOrd, rt.eval(rBuf.head), t) <= 0) {
                val row = rBuf.next()
                bestVal = rvProj(row).copy()
                bestKeyRow = rkProj(row).copy()
              } else scan = false
            }
            if (bestVal != null &&
                cmp(keyOrd, bestKeyRow.get(0, keyType), k) == 0) bestVal
            else nullRow
          } else {
            // forward: discard rights strictly before this left row
            // (they can serve no later left either — left times only
            // grow within a key), then PEEK the head without consuming
            // (it may serve the next left row too)
            var scan = true
            while (scan && rBuf.hasNext) {
              val hk = rk.eval(rBuf.head)
              val ck = cmp(keyOrd, hk, k)
              if (ck < 0 || (ck == 0 && cmp(timeOrd, rt.eval(rBuf.head), t) < 0))
                rBuf.next()
              else scan = false
            }
            if (rBuf.hasNext && cmp(keyOrd, rk.eval(rBuf.head), k) == 0)
              rvProj(rBuf.head).copy()
            else nullRow
          }
        numOutputRows += 1
        outProj(joined(lrow, valRow))
      }
    }
  }
}
