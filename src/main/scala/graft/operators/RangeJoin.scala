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
}
