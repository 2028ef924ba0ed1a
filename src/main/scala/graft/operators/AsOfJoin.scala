package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the greatest right `rightTime`
  * value at-or-before the left row's `leftTime`, per join key.
  *
  * Scale-first formulation: union both sides, one hash shuffle on the key,
  * then a partition-local ordered window with `last(_, ignoreNulls)`. No
  * range cross-product, no per-row probe, no broadcast of the right side —
  * at 100 TB this is a single exchange + sort, and AQE handles skewed keys.
  * (The reference has no as-of join; this is a north-star extension for
  * time-series feature joins — SURVEY.md §2.5/§7.6.)
  */
object AsOfJoin {

  /** @param rightValue column of `right` to carry; the matched value lands
    *                   in `outCol` (null when no right row precedes).
    *                   Right-side ties on time resolve to the max value,
    *                   matching `SELECT max(v) ... WHERE rt <= lt`.
    */
  def lookupLast(left: DataFrame, right: DataFrame, key: String,
                 leftTime: String, rightTime: String, rightValue: String,
                 outCol: String): DataFrame = {
    val lcols = left.columns.toSeq
    val rvType = right.schema(rightValue).dataType
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      struct(lcols.map(col): _*).as("_lrow"),
      lit(null).cast(rvType).as("_rv"))
    val lrowType = l.schema("_lrow").dataType
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      lit(null).cast(lrowType).as("_lrow"),
      col(rightValue).as("_rv"))
    // right rows (side 0) sort before left rows at equal time => inclusive
    // (<=) semantics; _rv in the ordering makes equal-time right rows
    // deterministic (last = max).
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(outCol, last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lcols.map(c => col("_lrow").getField(c).as(c)) :+ col(outCol): _*)
  }

  /** Shared builder for the NATIVE whole-operator path
    * ([[graft.plans.AsOfJoinNode]] → AsOfJoinStrategy → AsOfJoinExec):
    * a custom logical node planned as one co-partitioned streaming
    * merge — no union row inflation, no window buffer, O(1) operator
    * state per partition.
    */
  private def nativeJoin(left: DataFrame, right: DataFrame, key: String,
                         leftTime: String, rightTime: String,
                         carry: Seq[(String, String)],
                         forward: Boolean): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlanRaw = right.queryExecution.analyzed
    // self-join hygiene: when both sides descend from the same relation
    // they share exprIds, and the analyzer's DeduplicateRelations can't
    // know which side OUR captured expressions meant (an ambiguous attr
    // stays valid through the left child, so the generic remap skips
    // it). Re-alias the right side with fresh exprIds up front — the
    // same thing Dataset.join does for its own self-join case.
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
    val outAttrs = carry.map { case (rc, outName) =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        outName, attr(rPlan, rc).dataType, nullable = true)()
    }
    org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, leftTime), attr(rPlan, rightTime),
        carry.map(c => attr(rPlan, c._1)), outAttrs, forward))
  }

  /** [[lookupLast]] through the native path. Identical contract
    * (latest right time at-or-before, equal-time ties to the max
    * value, null when nothing precedes) — spec-pinned row-equal, and
    * q201 grades it against q10's subquery oracle.
    */
  def lookupLastNative(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String, rightValue: String,
                       outCol: String): DataFrame =
    nativeJoin(left, right, key, leftTime, rightTime,
      Seq(rightValue -> outCol), forward = false)

  /** [[lookupNext]] through the native path: earliest right time
    * at-or-after, equal-time ties to the MIN value (the merge head
    * under the (time, value)-ascending sort IS that row).
    */
  def lookupNextNative(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String, rightValue: String,
                       outCol: String): DataFrame =
    nativeJoin(left, right, key, leftTime, rightTime,
      Seq(rightValue -> outCol), forward = true)

  /** [[lookupLastWithin]] through the native path: the operator
    * carries the matched (value, time) pair — value first, so the
    * equal-time tie rule matches the composed window's `_rv` ordering
    * — and staleness is a per-row projection afterwards, exactly the
    * composed form's shape.
    */
  def lookupLastWithinNative(left: DataFrame, right: DataFrame, key: String,
                             leftTime: String, rightTime: String,
                             rightValue: String, outCol: String,
                             tolerance: org.apache.spark.sql.Column): DataFrame = {
    val mt = s"__asof_${rightTime}_matched"
    nativeJoin(left, right, key, leftTime, rightTime,
        Seq(rightValue -> outCol, rightTime -> mt), forward = false)
      .withColumn(outCol,
        when(col(mt) >= col(leftTime) - tolerance, col(outCol)))
      .drop(mt)
  }

  /** Backward as-of join with a match tolerance (pandas
    * `merge_asof(tolerance=...)`): like [[lookupLast]], but a match
    * older than `tolerance` is discarded — a quote from last month is
    * not a usable "latest quote". `tolerance` is a Column so it works
    * for any time type: an interval literal for timestamps
    * (`expr("INTERVAL 1 HOUR")`), a plain number for numeric times.
    * Inclusive: `rightTime >= leftTime - tolerance`.
    *
    * Same one-shuffle union+window shape; the window carries the
    * matched (time, value) pair as a struct so the age check is a
    * per-row projection afterwards — no second join, no extra
    * exchange.
    */
  def lookupLastWithin(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String, rightValue: String,
                       outCol: String,
                       tolerance: org.apache.spark.sql.Column): DataFrame = {
    val lcols = left.columns.toSeq
    val rvType = right.schema(rightValue).dataType
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      struct(lcols.map(col): _*).as("_lrow"),
      lit(null).cast(rvType).as("_rv"))
    val lrowType = l.schema("_lrow").dataType
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      lit(null).cast(lrowType).as("_lrow"),
      col(rightValue).as("_rv"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(
        when(col("_side") === 0, struct(col("_t").as("t"), col("_rv").as("v"))),
        ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .withColumn(outCol,
        when(col("_m.t") >= col("_t") - tolerance, col("_m.v")))
      .select(lcols.map(c => col("_lrow").getField(c).as(c)) :+ col(outCol): _*)
  }

  /** Forward as-of join: for each left row, the right value at the
    * SMALLEST `rightTime` at-or-after the left row's `leftTime`, per
    * key (null when none follows). Same single-shuffle union+window
    * shape as [[lookupLast]], mirrored: the window looks forward and
    * `first(_, ignoreNulls)` picks the earliest following right row
    * (ties on time resolve to the min value — `min(v) WHERE rt =
    * min(rt >= lt)`).
    */
  def lookupNext(left: DataFrame, right: DataFrame, key: String,
                 leftTime: String, rightTime: String, rightValue: String,
                 outCol: String): DataFrame = {
    val lcols = left.columns.toSeq
    val rvType = right.schema(rightValue).dataType
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      struct(lcols.map(col): _*).as("_lrow"),
      lit(null).cast(rvType).as("_rv"))
    val lrowType = l.schema("_lrow").dataType
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      lit(null).cast(lrowType).as("_lrow"),
      col(rightValue).as("_rv"))
    // left rows (side 1) sort BEFORE right rows at equal time under
    // _side descending => inclusive (>=) semantics looking forward;
    // _rv ascending makes equal-time right rows deterministic
    // (first = min)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side").desc, col("_rv"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn(outCol, first(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lcols.map(c => col("_lrow").getField(c).as(c)) :+ col(outCol): _*)
  }
}
