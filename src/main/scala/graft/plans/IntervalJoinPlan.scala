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
    * state is O(max concurrent overlap) BY DESIGN — the output degree
    * the data demands. Below `spark.graft.intervalJoin.inMemoryRows`
    * (default 64k) the set lives in an on-heap array; past it the
    * buffer migrates into the SAME spill-capable structure
    * SortMergeJoin buffers its matches in (UnsafeExternalSorter via
    * ExternalAppendOnlyUnsafeRowArray), so a hot key degrades to disk
    * IO instead of an executor OOM. The ceiling stays ENFORCED on top:
    * crossing `spark.graft.intervalJoin.maxActive` (default 4M rows)
    * fails the task loudly, naming the conf — at that point the
    * output itself is quadratic-degree and the caller should pre-split
    * the key, not spill harder. The `maxActiveRights` metric reports
    * the observed peak so a near-miss is visible in the SQL UI before
    * it becomes an incident.
    */
  private def maxActiveLimit: Long =
    conf.getConfString("spark.graft.intervalJoin.maxActive", (4L << 20).toString).toLong

  private def inMemoryRows: Int =
    conf.getConfString("spark.graft.intervalJoin.inMemoryRows", (64 << 10).toString).toInt

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val maxActiveRights = longMetric("maxActiveRights")
    val maxActive = maxActiveLimit
    val memRows = inMemoryRows
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
      // key whose end might still exceed a future left's start. Small
      // sets live on heap; past `inMemoryRows` the buffer is the same
      // spill-capable sorter SMJ's buffered side uses. Dead rights
      // (end <= current left start — dead for every later left too,
      // starts only grow) are filtered at emission and physically
      // dropped by a REBUILD once they are half the buffer: the
      // spillable structure is append-only, so compaction is
      // copy-the-survivors, amortized O(1) per buffered row.
      def newActive() = new org.apache.spark.sql.graftbridge
        .SpillableRowBuffer(memRows, 32L << 20)
      var active = newActive()
      var deadSeen = 0L // dead rights counted in the last emission scan
      var curKey: UnsafeRow = null // active rows' key (a copied probe row)
      var peakActive = 0L // this partition's peak, reported incrementally
      var keyEmitted = 0L // rows emitted for curKey — names the hot key
      lIter.flatMap { lrow =>
        val lkse = lkseProj(lrow)
        if (lkse.isNullAt(0) || lkse.isNullAt(1) || lkse.isNullAt(2) ||
            lkse.getLong(1) >= lkse.getLong(2)) Iterator.empty
        else {
          val ls = lkse.getLong(1)
          val le = lkse.getLong(2)
          if (curKey == null || keyOrd.compare(curKey, lkse) != 0) {
            active.clear()
            deadSeen = 0L
            curKey = lkse.copy()
            keyEmitted = 0L
          } else if (deadSeen * 2 >= active.length.toLong && deadSeen > 0) {
            // compact: copy survivors (end beyond this left's start)
            // into a fresh buffer; the old one frees its pages/files
            val fresh = newActive()
            val it = active.iterator
            while (it.hasNext) {
              val r = it.next()
              if (r.getLong(2) > ls) fresh.add(r)
            }
            active.clear()
            active = fresh
            deadSeen = 0L
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
                  active.add(rRowProj(r)) // the buffer copies on add
                  if (active.length > peakActive) {
                    maxActiveRights += active.length - peakActive
                    peakActive = active.length
                  }
                  if (active.length > maxActive) {
                    // the buffer may be up to ~2x the LIVE set (lazy
                    // compaction retains dead rights between rebuilds)
                    // — force a compaction and only fail if the true
                    // concurrent-overlap degree crosses the ceiling
                    val fresh = newActive()
                    val it = active.iterator
                    while (it.hasNext) {
                      val r2 = it.next()
                      if (r2.getLong(2) > ls) fresh.add(r2)
                    }
                    active.clear()
                    active = fresh
                    deadSeen = 0L
                    if (active.length > maxActive)
                      // name the hot key and its observed counts so the
                      // failure is actionable without a re-run
                      throw new IllegalStateException(
                        s"interval join: active right set exceeded " +
                        s"spark.graft.intervalJoin.maxActive=$maxActive rows " +
                        s"on key `${curKey.get(0, keyType)}` " +
                        s"(${active.length} live buffered rights, " +
                        s"$keyEmitted rows already emitted for this key) " +
                        s"— past the spill tier this is a " +
                        s"quadratic overlap degree; raise the conf only " +
                        s"if that output is intended, else pre-split " +
                        s"the hot key")
                  }
                }
              } else scan = false
            }
          }
          // lazily emit the overlaps in one pass over the buffer:
          // max(ls,rs) < min(le,re) = rs < le && re > ls for proper
          // intervals; rows failing re > ls are counted dead for the
          // next compaction decision
          val it = active.iterator
          var scanDead = 0L
          new Iterator[InternalRow] {
            private var nextR: UnsafeRow = null
            private def seek(): Unit = {
              nextR = null
              while (nextR == null && it.hasNext) {
                val r = it.next()
                if (r.getLong(2) <= ls) scanDead += 1
                else if (r.getLong(1) < le) nextR = r
              }
              if (!it.hasNext && nextR == null) deadSeen = scanDead
            }
            seek()
            override def hasNext: Boolean = nextR != null
            override def next(): InternalRow = {
              numOutputRows += 1
              keyEmitted += 1
              val out = outProj(joined(lrow, nextR))
              seek()
              out
            }
          }
        }
      }
    }
  }
}
