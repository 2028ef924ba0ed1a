package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximize both axes): the points no
  * other point weakly dominates ((x' >= x, y' >= y) with one strict).
  *
  * The quadratic NOT-EXISTS definition collapses to a sweep: among
  * points sharing an x only the max-y survives as a candidate, and a
  * candidate is on the frontier iff its y strictly exceeds every y at
  * larger x — a running max over x descending. Two hash aggregates
  * plus one ordered window over the O(distinct x) candidate set.
  *
  * Scale shape: the window is unpartitioned (a running max is
  * inherently sequential), but it runs over per-x maxima, not rows. If
  * distinct x is itself huge, pre-prune with a coarse x-grid first:
  * per-bucket max-y discards every point below its bucket's best
  * before the exact sweep — same two-level trick as the exact-median
  * operator. n_pts carries how many raw rows sit on each frontier
  * point, so the output also answers "how contested is the corner".
  */
object Skyline {

  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_pts"))
    val bestAtX = pts
      .withColumn("_my", max(col("y")).over(Window.partitionBy(col("x"))))
      .where(col("y") === col("_my"))
    val sweep = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bestAtX
      .withColumn("_prev", max(col("y")).over(sweep))
      .where(col("_prev").isNull || col("y") > col("_prev"))
      .select(col("x"), col("y"), col("n_pts"))
  }
}
