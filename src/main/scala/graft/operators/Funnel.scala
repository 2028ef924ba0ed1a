package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many users reach each stage of an
  * event sequence, where stage i+1 counts only strictly AFTER the
  * user's first stage-i event (the match_recognize-style product
  * analytics query).
  *
  * Scale shape: one shuffle on the user key; each stage is another
  * window pass over the SAME partitioning (no further exchange), the
  * per-user reduction reuses it too, and the final melt is O(users ·
  * stages) rows into one tiny stage-keyed aggregate.
  */
object Funnel {

  /** @return one row per stage: (stage_idx 1-based, stage, n_users
    *         whose first-reach chain got this far).
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val w = Window.partitionBy(col(userCol))
    var cur = df.select(col(userCol), col(typeCol), col(tsCol))
    stages.zipWithIndex.foldLeft(Option.empty[String]) { case (prev, (st, i)) =>
      val cond = prev match {
        case Some(p) => col(typeCol) === st && col(tsCol) > col(p)
        case None => col(typeCol) === st
      }
      cur = cur.withColumn(s"_t$i", min(when(cond, col(tsCol))).over(w))
      Some(s"_t$i")
    }
    val reachCols = stages.indices.map(i => max(col(s"_t$i")).as(s"_t$i"))
    val perUser = cur.groupBy(col(userCol)).agg(reachCols.head, reachCols.tail: _*)
    perUser
      .select(explode(array(stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).cast("long").as("stage_idx"), lit(st).as("stage"),
          col(s"_t$i").isNotNull.as("reached"))
      }: _*)).as("s"))
      .groupBy(col("s.stage_idx").as("stage_idx"), col("s.stage").as("stage"))
      .agg(sum(when(col("s.reached"), 1L).otherwise(0L)).as("n_users"))
  }

  /** Cohort retention matrix: users grouped by first-activity period
    * (floor(ts / periodSec), epoch-based), counted as retained in each
    * later period they act in. Two passes over the SAME user-keyed
    * partitioning (first-seen window, then the distinct periods), one
    * tiny (cohort, offset) aggregate. Emits (cohort_period,
    * period_offset, n_users) — the standard retention triangle.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      periodSec: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    df.select(col(userCol),
        floor(unix_timestamp(col(tsCol)).cast("double") / periodSec)
          .cast("long").as("_p"))
      .withColumn("cohort_period", min(col("_p")).over(w))
      .select(col(userCol), col("cohort_period"),
        (col("_p") - col("cohort_period")).as("period_offset"))
      .distinct()
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
