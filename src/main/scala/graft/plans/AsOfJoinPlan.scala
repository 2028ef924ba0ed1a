package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
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

  /** An as-of join emits EXACTLY one row per left row — the node knows
    * its own cardinality, so say so. The default BinaryNode estimate is
    * the product of the children's sizes, which overestimates this
    * output by |right| and suppresses a legitimate broadcast when the
    * as-of result is the small side of a downstream join (the same
    * optimizer-barrier class the pushdown/pruning rules close). Size =
    * left's bytes scaled by the carried columns' width share; row count
    * carries through untouched.
    */
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    val ls = left.stats
    val lw = BigInt(math.max(1, left.output.map(_.dataType.defaultSize).sum))
    val ow = BigInt(outAttrs.map(_.dataType.defaultSize).sum)
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = (ls.sizeInBytes * (lw + ow) / lw).max(1),
      rowCount = ls.rowCount)
  }

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

  /** The merge pass runs BETWEEN whole-stage-codegen'd stages (the
    * children's exchanges + sorts fuse; a binary streaming-merge
    * CodegenSupport would have to re-derive SortMergeJoin's buffered-
    * side machinery for little gain — the pass is already one tight
    * loop). What IS eliminated is every interpreted/boxed per-row
    * operation: both sides project their (key, time) through CODEGEN'd
    * UnsafeProjections onto one common 2-col shape, comparisons run
    * through GENERATED unboxed orderings over that shape (nulls-first
    * ascending = the required child sort), the matched right projects
    * ONCE through a single merged [key, values…] projection, and the
    * backward path's held best row reuses one UnsafeRow buffer via
    * copyFrom (zero per-match allocation). The forward path holds no
    * state at all — it projects the peeked head straight into the
    * (codegen'd) output projection.
    */
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
    // the held/peeked right row carries [key, values…]; the output
    // projection drops the key slot (it exists only for the stale-key
    // check when the left side advances past the held match's key)
    val keyAttr = AttributeReference("_asof_key", keyType)()
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      import org.apache.spark.sql.types.{StructField, StructType}
      val ktShape = StructType(Seq(StructField("k", keyType), StructField("t", timeType)))
      // generated orderings: keyOrd touches ordinal 0 only, ktOrd
      // ordinals 0-1 — both unboxed, nulls-first ascending (null keys
      // join null keys; null times sort first), exactly the required
      // child orderings' semantics
      val keyOrd = org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
        .create(StructType(ktShape.take(1)))
      val ktOrd = org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
        .create(ktShape)
      val lktProj = UnsafeProjection.create(Seq(lkE, ltE), leftOutput)
      val rktProj = UnsafeProjection.create(Seq(rkE, rtE), rightOutput)
      val rowProj = UnsafeProjection.create(rkE +: rvE, rightOutput)
      val outProj = UnsafeProjection.create(output, leftOutput ++ (keyAttr +: outAttrsLocal))
      val nullRow = new GenericInternalRow(1 + outAttrsLocal.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // backward state: the current best [key, values…] match in ONE
      // reused buffer (iterator rows are reused, so the held match must
      // be copied out) — O(1) per partition
      val best = new UnsafeRow(1 + rvE.length)
      best.pointTo(new Array[Byte](64), 64)
      var hasBest = false
      lIter.map { lrow =>
        val lkt = lktProj(lrow)
        val valRow: InternalRow =
          if (!fwd) {
            var scan = true
            while (scan && rBuf.hasNext) {
              val rkt = rktProj(rBuf.head)
              val ck = keyOrd.compare(rkt, lkt)
              if (ck < 0) {
                // rights for keys the (ascending) left side has passed
                rBuf.next()
                hasBest = false
              } else if (ck == 0 && ktOrd.compare(rkt, lkt) <= 0) {
                best.copyFrom(rowProj(rBuf.next()))
                hasBest = true
              } else scan = false
            }
            if (hasBest && keyOrd.compare(best, lkt) == 0) best else nullRow
          } else {
            // forward: discard rights strictly before this left row
            // (they can serve no later left either — left times only
            // grow within a key), then PEEK the head without consuming
            // (it may serve the next left row too). ktOrd < 0 is
            // exactly key < OR (key == AND time <).
            var scan = true
            while (scan && rBuf.hasNext) {
              if (ktOrd.compare(rktProj(rBuf.head), lkt) < 0) rBuf.next()
              else scan = false
            }
            if (rBuf.hasNext && keyOrd.compare(rktProj(rBuf.head), lkt) == 0)
              rowProj(rBuf.head)
            else nullRow
          }
        numOutputRows += 1
        outProj(joined(lrow, valRow))
      }
    }
  }
}
