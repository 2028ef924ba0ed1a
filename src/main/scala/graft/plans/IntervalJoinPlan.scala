package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Native interval-overlap join — the tier-(c) whole-operator form of
  * [[graft.operators.RangeJoin.overlapJoin]]'s binned equi-join: a
  * custom LogicalPlan + Strategy + plane-sweep SparkPlan.
  *
  * Contract (matching the composed binned form exactly): emit every
  * (left, right) row pair sharing an equal non-null key whose half-open
  * integer intervals [start, end) overlap — i.e.
  * `max(l.start, r.start) < min(l.end, r.end)`. Improper intervals
  * (start >= end) and rows with a null key/start/end never match
  * (inner-join semantics; the composed form filters `start < end` and
  * equi-joins the key).
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * by (key, start), then ONE sweep per partition. The sweep holds the
  * ACTIVE right set — rights of the current key whose end is beyond
  * the current left start — and advances it monotonically: a right
  * enters when its start falls below the current left's end, leaves
  * forever once its end drops at-or-below the current left's start
  * (left starts only grow within a key, so it can never match again).
  * Operator state is O(max concurrent overlap) per partition — the
  * output degree the data itself demands — vs the composed form's
  * 2x-replicated bin rows + post-join DISTINCT (a second full shuffle
  * of the match set). No bin-width parameter to tune, no NLJ anywhere;
  * cost is exactly the two keyed exchanges + sorts.
  *
  * Like [[AsOfJoinExec]], the sweep runs BETWEEN whole-stage-codegen'd
  * stages with zero interpreted per-row work: both sides project
  * (key, start, end) through codegen'd UnsafeProjections, the key
  * comparison runs through a generated unboxed ordering, start/end are
  * primitive getLong reads (the node requires LongType bounds), and
  * buffered rights are single UnsafeRow copies carrying
  * [key, start, end, right cols…] so the output projection reads them
  * in place.
  */
case class IntervalJoinNode(left: LogicalPlan, right: LogicalPlan,
                            leftKey: Expression, rightKey: Expression,
                            leftStart: Expression, leftEnd: Expression,
                            rightStart: Expression, rightEnd: Expression)
    extends BinaryNode {
  require(Seq(leftStart, leftEnd, rightStart, rightEnd)
            .forall(_.dataType == LongType),
    "IntervalJoinNode bounds must be LongType (cast epoch days/micros/offsets first)")
  require(leftKey.dataType == rightKey.dataType,
    s"key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")
  override def output: Seq[Attribute] = left.output ++ right.output

  /** Overlap joins are selective: the output degree is the data's
    * concurrent-overlap count, not |left|·|right|. The default
    * BinaryNode product estimate would mark any downstream join
    * over this output unbroadcastable; cap the estimate at a small
    * fan-out of the inputs (each side read once + a bounded match
    * multiplier) while keeping the true product as a floor for tiny
    * inputs where the product IS the honest bound.
    */
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    val l = left.stats.sizeInBytes
    val r = right.stats.sizeInBytes
    val capped = ((l + r) * 8).min(l * r).max(l.max(r)).max(1)
    org.apache.spark.sql.catalyst.plans.logical.Statistics(sizeInBytes = capped)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinNode(l, r, lk, rk, ls, le, rs, re) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, ls, le, rs, re) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(left: SparkPlan, right: SparkPlan,
                            leftKey: Expression, rightKey: Expression,
                            leftStart: Expression, leftEnd: Expression,
                            rightStart: Expression, rightEnd: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "maxActiveRights" -> SQLMetrics.createMetric(sparkContext,
      "peak buffered right rows (summed per-partition peaks)"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftStart, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightStart, Ascending)))

  // output rows keep the left side's clustering and (key, start) order:
  // each left row's matches emit consecutively, lefts in child order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  /** Upper bound on the active right set, per partition. The sweep's
    * memory is O(max concurrent overlap) BY DESIGN — the output degree
    * the data demands — but unlike SortMergeJoin's buffered side it has
    * no spill path, so one pathological key (every right interval
    * long-lived and mutually overlapping) would otherwise grow the
    * buffer until the executor OOMs with no attribution. The guard
    * makes that contract ENFORCED: crossing the cap fails the task
    * loudly, naming the operator, the cap, and the conf to raise
    * (`spark.graft.intervalJoin.maxActive`; default 4M rows ≈ hundreds
    * of MB of copied UnsafeRows — far past any sane overlap degree).
    * The `maxActiveRights` metric reports the observed peak so a
    * near-miss is visible in the SQL UI before it becomes an incident.
    */
  private def maxActiveLimit: Long =
    conf.getConfString("spark.graft.intervalJoin.maxActive", (4L << 20).toString).toLong

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val maxActiveRights = longMetric("maxActiveRights")
    val maxActive = maxActiveLimit
    val keyType = leftKey.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val (lkE, lsE, leE) = (leftKey, leftStart, leftEnd)
    val (rkE, rsE, reE) = (rightKey, rightStart, rightEnd)
    val outputLocal = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // [key, start, end] probe shape both sides; keyOrd touches
      // ordinal 0 only — unboxed, nulls-first ascending (the required
      // child sorts' semantics); start/end are primitive long reads
      val kseShape = StructType(Seq(StructField("k", keyType),
        StructField("s", LongType), StructField("e", LongType)))
      val keyOrd = org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
        .create(StructType(kseShape.take(1)))
      val lkseProj = UnsafeProjection.create(Seq(lkE, lsE, leE), leftOutput)
      val rkseProj = UnsafeProjection.create(Seq(rkE, rsE, reE), rightOutput)
      // buffered rights carry their probe prefix so the sweep tests
      // them in place; the output projection skips the 3 probe slots
      val rRowProj = UnsafeProjection.create(Seq(rkE, rsE, reE) ++ rightOutput, rightOutput)
      val kAttr = org.apache.spark.sql.catalyst.expressions
        .AttributeReference("_ij_k", keyType)()
      val sAttr = org.apache.spark.sql.catalyst.expressions
        .AttributeReference("_ij_s", LongType)()
      val eAttr = org.apache.spark.sql.catalyst.expressions
        .AttributeReference("_ij_e", LongType)()
      val outProj = UnsafeProjection.create(outputLocal,
        leftOutput ++ (Seq(kAttr, sAttr, eAttr) ++ rightOutput))
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // the active set: copied [k,s,e,cols…] rights of the CURRENT left
      // key whose end might still exceed a future left's start
      val active = new java.util.ArrayList[UnsafeRow]()
      var curKey: UnsafeRow = null // active rows' key (a copied probe row)
      var peakActive = 0L // this partition's peak, reported incrementally
      lIter.flatMap { lrow =>
        val lkse = lkseProj(lrow)
        if (lkse.isNullAt(0) || lkse.isNullAt(1) || lkse.isNullAt(2) ||
            lkse.getLong(1) >= lkse.getLong(2)) Iterator.empty
        else {
          val ls = lkse.getLong(1)
          val le = lkse.getLong(2)
          if (curKey == null || keyOrd.compare(curKey, lkse) != 0) {
            active.clear()
            curKey = lkse.copy()
          }
          // pull rights up to this left's horizon: discard passed keys
          // and dead-on-arrival intervals, buffer live candidates, stop
          // at (key ahead) or (start >= end-of-this-left — a later left
          // with a larger end revisits the still-unconsumed head)
          var scan = true
          while (scan && rBuf.hasNext) {
            val rkse = rkseProj(rBuf.head)
            if (rkse.isNullAt(0) || rkse.isNullAt(1) || rkse.isNullAt(2)) {
              rBuf.next() // null key/bounds never match anything
            } else {
              val ck = keyOrd.compare(rkse, lkse)
              if (ck < 0) rBuf.next() // keys the left side has passed
              else if (ck == 0 && rkse.getLong(1) < le) {
                val rs = rkse.getLong(1)
                val re = rkse.getLong(2)
                val r = rBuf.next()
                // proper interval still able to reach this or a later
                // left (left starts only grow within the key)
                if (rs < re && re > ls) {
                  active.add(rRowProj(r).copy())
                  if (active.size > peakActive) {
                    maxActiveRights += active.size - peakActive
                    peakActive = active.size
                    if (peakActive > maxActive)
                      throw new IllegalStateException(
                        s"interval join: active right set exceeded " +
                        s"spark.graft.intervalJoin.maxActive=$maxActive rows " +
                        s"on one key — a pathological overlap degree this " +
                        s"operator buffers in memory by design; raise the " +
                        s"conf or pre-split the hot key")
                  }
                }
              } else scan = false
            }
          }
          // sweep the active set: compact out rights this left's start
          // has passed (dead for every later left too), lazily emit the
          // overlaps — max(ls,rs) < min(le,re) reduces to rs < le
          // (with re > ls held by compaction) for proper intervals
          var i = 0
          var w = 0
          while (i < active.size) {
            val r = active.get(i)
            if (r.getLong(2) > ls) {
              if (w != i) active.set(w, active.get(i))
              w += 1
            }
            i += 1
          }
          while (active.size > w) active.remove(active.size - 1)
          val n = active.size
          new Iterator[InternalRow] {
            private var idx = 0
            private def seek(): Unit = {
              while (idx < n && active.get(idx).getLong(1) >= le) idx += 1
            }
            seek()
            override def hasNext: Boolean = idx < n
            override def next(): InternalRow = {
              val r = active.get(idx)
              idx += 1
              seek()
              numOutputRows += 1
              outProj(joined(lrow, r))
            }
          }
        }
      }
    }
  }
}
