package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponential-smoothing forecasters — the cheap-and-robust end of the
  * forecasting family ([[graft.serving.ArxForecaster]]/SarimaxLite are
  * the regression end, per the reference's SARIMAX slot at
  * `prediction.py:60-74`): Holt's linear-trend method (double
  * exponential smoothing) fitted per key in ONE pass over each key's
  * ordered history.
  *
  * Scale shape: one hash aggregation collects each key's series into a
  * sorted struct array (bounded at days-per-key — thousands, not
  * data-scale), and the recurrence runs inside a codegen'd
  * `aggregate()` fold over that array — no window, no iteration, no
  * driver participation; millions of keys fit because each key is one
  * row after the agg. The h-step forecasts explode from the final
  * (level, trend) pair.
  *
  * Cross-engine float contract: callers should pick DYADIC smoothing
  * constants (0.5, 0.25, 0.75…) — exactly representable doubles — so
  * the recurrence replays bit-identically in any IEEE engine (the
  * repo's raw-doubles oracle policy); the update order below is the
  * textbook one (level first, then trend from the NEW level) and must
  * be mirrored verbatim by oracles.
  */
object Smoothing {

  /** Per-key Holt linear trend: `l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`, zero-trend init
    * (`l_1 = y_1, b_1 = 0` — no lookahead, single-point keys degrade
    * to a flat forecast). Output: one row per (key, horizon step h)
    * with `n` observed points, the fitted final `level`/`trend`, and
    * `yhat = level + h·trend`.
    */
  def holtLinear(df: DataFrame, keyCol: String, ordCol: String,
                 valCol: String, alpha: Double, beta: Double,
                 horizon: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"bad smoothing constants ($alpha, $beta)")
    require(horizon >= 1, s"bad horizon $horizon")
    val series = df
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(
        col(ordCol).as("_o"), col(valCol).cast("double").as("_y")))).as("_s"))
    val a = lit(alpha)
    val a1 = lit(1.0 - alpha)
    val b = lit(beta)
    val b1 = lit(1.0 - beta)
    def step(acc: Column, x: Column): Column = {
      val y = x.getField("_y")
      val lNew = a * y + a1 * (acc.getField("l") + acc.getField("b"))
      when(acc.getField("i") === 0L,
        struct(lit(1L).as("i"), y.as("l"), lit(0.0).as("b")))
        .otherwise(struct(
          (acc.getField("i") + 1L).as("i"),
          lNew.as("l"),
          (b * (lNew - acc.getField("l")) + b1 * acc.getField("b")).as("b")))
    }
    series
      .withColumn("_f", aggregate(col("_s"),
        struct(lit(0L).as("i"), lit(0.0).as("l"), lit(0.0).as("b")), step))
      .select(col(keyCol), col("_f.i").as("n"),
        col("_f.l").as("level"), col("_f.b").as("trend"),
        explode(sequence(lit(1L), lit(horizon.toLong))).as("h"))
      .withColumn("yhat",
        col("level") + col("h").cast("double") * col("trend"))
  }
}
