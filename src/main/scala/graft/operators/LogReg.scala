package graft.operators

import graft.functions.NumFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training — full-batch gradient
  * descent as Spark aggregates, the smallest real instance of the
  * data-parallel model-training loop (the same shape scales to any
  * linear model / GLM):
  *
  *  - the weight vector lives on the DRIVER (O(features) — a model
  *    parameter, like KMeans centroids and PQ codebooks) and re-enters
  *    each iteration's plan as literals;
  *  - one iteration = ONE aggregate pass over the corpus: per row the
  *    codegen'd sigmoid error, per feature a map-side-combined SUM —
  *    no shuffle wider than the d-column agg, no per-row state;
  *  - gradient sums route through [[NumFns.stableRound]] before the
  *    weight update, so the whole trajectory is decimal-pinned and an
  *    oracle replays it bit-for-bit despite order-dependent double
  *    sums (the q90 Lloyd-trajectory trick applied to GD).
  *
  * At 100 TB: iterations are corpus scans (the dominant cost anywhere)
  * with O(d) driver traffic per step — the classic Spark ML shape.
  */
object LogReg {

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  private def margin(featCols: Seq[String], w: Array[Double]): Column =
    featCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, j)) => acc + col(c) * lit(w(j + 1))
    }

  /** Train `iters` full-batch GD steps from w = 0. Features are the
    * given numeric columns plus an implicit leading bias; labels must
    * be 0/1. Returns the final weights (bias first).
    */
  def train(df: DataFrame, featCols: Seq[String], labelCol: String,
            lr: Double = 0.5, iters: Int = 3,
            stableScale: Int = 9): Array[Double] = {
    val n = df.count()
    require(n > 0, "empty training set")
    var w = Array.fill(featCols.length + 1)(0.0)
    var it = 0
    while (it < iters) {
      val err = sigmoid(margin(featCols, w)) - col(labelCol).cast("double")
      val aggs = (lit(1.0) +: featCols.map(col)).zipWithIndex.map {
        case (x, j) => NumFns.stableRound(sum(err * x), stableScale).as(s"g$j")
      }
      val g = df.agg(aggs.head, aggs.tail: _*).head()
      w = w.zipWithIndex.map { case (wj, j) => wj - lr * g.getDouble(j) / n }
      it += 1
    }
    w
  }

  /** Score with trained weights: p = sigmoid(w·x) (r15-stabilized),
    * pred = p >= 0.5 on the ROUNDED p so both engines gate on the
    * identical decimal.
    */
  def score(df: DataFrame, featCols: Seq[String], w: Array[Double],
            pScale: Int = 6): DataFrame =
    df.withColumn("p", NumFns.stableRound(sigmoid(margin(featCols, w)), pScale))
      .withColumn("pred", col("p") >= 0.5)
}
