package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: match left rows (key, t) to right rows (key, rt)
  * with rt in [t - window, t), without a cartesian/broadcast-nested-loop
  * plan. Each right row is exploded into the two time bins it can serve
  * (bin width = window), the join is a plain equi-join on (key, bin),
  * and the exact range predicate filters the at-most-2x candidates.
  * One hash shuffle each side — survives 100x data where a range-theta
  * join degrades to NLJ.
  */
object RangeJoin {

  /** Count right matches per left row (zero-preserving).
    * @param windowUs range width in microseconds
    * Output: all left columns + `outCol` count.
    */
  def countInWindow(left: DataFrame, right: DataFrame, key: String,
                    leftTime: String, rightTime: String,
                    windowUs: Long, outCol: String): DataFrame = {
    val l = left
      .withColumn("_lrid", monotonically_increasing_id()) // preserves
      // duplicate left rows through the regrouping below
      .withColumn("_lus", unix_micros(col(leftTime)))
      .withColumn("_bin", floor(col("_lus") / windowUs))
    val r = right
      .withColumn("_rus", unix_micros(col(rightTime)))
      .withColumn("_bin", explode(array(
        floor(col("_rus") / windowUs), floor(col("_rus") / windowUs) + 1)))
      .select(col(key).as("_rkey"), col("_rus"), col("_bin"))
    val matched = l.join(r,
        l(key) === r("_rkey") && l("_bin") === r("_bin") &&
          col("_rus") >= col("_lus") - windowUs && col("_rus") < col("_lus"),
        "left")
      .groupBy((col("_lrid") +: left.columns.map(l(_))): _*)
      .agg(count(col("_rus")).as(outCol))
    matched.select(left.columns.map(col) :+ col(outCol): _*)
  }

  /** Interval-interval overlap join (half-open [start, end) semantics,
    * integer units — epoch days, micros, token offsets): emit every
    * (left, right) pair sharing a key whose intervals overlap, with the
    * overlap window. Same device as [[countInWindow]]: each interval
    * explodes into the width-`binWidth` bins it touches, candidates
    * meet on a plain (key, bin) equi-join, a pair spanning several
    * shared bins dedups by id, and the exact predicate
    * `max(start) < min(end)` filters — no theta-join NLJ anywhere.
    *
    * Scale shape: shuffle keyed on (key, bin) both sides; the explosion
    * factor is len/binWidth + 1, so pick binWidth near the median
    * interval length (explosion ~2x) — the classic DB2/Iceberg binned
    * overlap plan. Degenerate keys (one bin holding many long
    * intervals) are the salting case, same as any skewed equi-join.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  leftKey: String, leftId: String, leftStart: String, leftEnd: String,
                  rightKey: String, rightId: String, rightStart: String, rightEnd: String,
                  binWidth: Long): DataFrame = {
    def binned(df: DataFrame, key: String, id: String, s0: String, e0: String,
               p: String) =
      df.select(col(key).as(s"${p}_key"), col(id).as(s"${p}_id"),
          col(s0).cast("long").as(s"${p}_start"), col(e0).cast("long").as(s"${p}_end"))
        .where(col(s"${p}_start") < col(s"${p}_end"))
        .withColumn("_bin", explode(sequence(
          floor(col(s"${p}_start") / binWidth),
          floor((col(s"${p}_end") - 1) / binWidth))))
    val l = binned(left, leftKey, leftId, leftStart, leftEnd, "a")
    val r = binned(right, rightKey, rightId, rightStart, rightEnd, "b")
    l.join(r, col("a_key") === col("b_key") && l("_bin") === r("_bin") &&
        greatest(col("a_start"), col("b_start")) <
          least(col("a_end"), col("b_end")))
      .drop("_bin").distinct() // a pair meets once per shared bin
      .select(col("a_key").as("key"), col("a_id"), col("b_id"),
        greatest(col("a_start"), col("b_start")).as("ov_start"),
        least(col("a_end"), col("b_end")).as("ov_end"))
      .withColumn("ov_len", col("ov_end") - col("ov_start"))
  }

  /** [[overlapJoin]] through the NATIVE whole-operator path
    * ([[graft.plans.IntervalJoinNode]] → IntervalJoinStrategy →
    * IntervalJoinExec): identical contract and output columns, planned
    * as one co-partitioned plane sweep — no 2x bin replication, no
    * post-join DISTINCT shuffle, no bin-width parameter; operator
    * state is the max concurrent overlap per key. Spec-pinned
    * row-equal to the composed form; q207 grades it against q124's
    * direct-inequality oracle.
    */
  def overlapJoinNative(left: DataFrame, right: DataFrame,
                        leftKey: String, leftId: String, leftStart: String, leftEnd: String,
                        rightKey: String, rightId: String, rightStart: String, rightEnd: String)
      : DataFrame = {
    def shaped(df: DataFrame, key: String, id: String, s0: String, e0: String,
               p: String) =
      df.select(col(key).as(s"${p}_key"), col(id).as(s"${p}_id"),
          col(s0).cast("long").as(s"${p}_start"), col(e0).cast("long").as(s"${p}_end"))
        .where(col(s"${p}_start") < col(s"${p}_end"))
    val l = shaped(left, leftKey, leftId, leftStart, leftEnd, "a")
    val r = shaped(right, rightKey, rightId, rightStart, rightEnd, "b")
    val lPlan = l.queryExecution.analyzed
    val rPlanRaw = r.queryExecution.analyzed
    // self-join hygiene (same device as AsOfJoin.nativeJoin): when both
    // sides descend from one relation they share exprIds — re-alias the
    // right with fresh ids so our captured attrs stay unambiguous
    val rPlan =
      if (rPlanRaw.outputSet.intersect(lPlan.outputSet).isEmpty) rPlanRaw
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlanRaw.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        rPlanRaw)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(left.sparkSession,
        graft.plans.IntervalJoinNode(lPlan, rPlan,
          attr(lPlan, "a_key"), attr(rPlan, "b_key"),
          attr(lPlan, "a_start"), attr(lPlan, "a_end"),
          attr(rPlan, "b_start"), attr(rPlan, "b_end")))
      .select(col("a_key").as("key"), col("a_id"), col("b_id"),
        greatest(col("a_start"), col("b_start")).as("ov_start"),
        least(col("a_end"), col("b_end")).as("ov_end"))
      .withColumn("ov_len", col("ov_end") - col("ov_start"))
  }
}
