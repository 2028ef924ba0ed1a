package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — the time-series
  * normalization every downstream consumer assumes and raw data never
  * provides: a per-key DAILY grid spanning each key's own observed
  * range, gaps carrying the last observation forward (the "ffill" of
  * pandas/kdb), with the fill provenance kept as a flag (a filled
  * price is not an observed price — models that care must know).
  *
  * Scale shape: observations collapse to one row per (key, day) first
  * (map-side-combined hash agg — dup-day determinism by MAX), the grid
  * explodes per key from its own (min, max) bounds — O(range-days) per
  * key, never a global calendar join — and the fill is one per-key
  * ordered window whose running `last(ignoreNulls)` frame is
  * incrementally evaluated (no per-key buffering beyond the frame).
  * Everything is exactly replayable in SQL (LAST_VALUE IGNORE NULLS).
  */
object Resample {

  /** (keyCol, d DATE, v, filled) — one row per day per key from the
    * key's first to last observed day; `v` = the observed value that
    * day (MAX when duplicated) or the last observed before it;
    * `filled` marks the forward-filled rows. Leading rows before a
    * key's first observation cannot exist (the grid starts there).
    */
  def ffillDaily(df: DataFrame, keyCol: String, dateCol: String,
                 valCol: String): DataFrame = {
    val obs = df
      .select(col(keyCol), to_date(col(dateCol)).as("d"),
        col(valCol).as("_v"))
      .where(col("d").isNotNull && col("_v").isNotNull)
      .groupBy(col(keyCol), col("d")).agg(max(col("_v")).as("_v"))
    val spine = obs.groupBy(col(keyCol))
      .agg(min(col("d")).as("_lo"), max(col("d")).as("_hi"))
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("d"))
    val w = Window.partitionBy(keyCol).orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq(keyCol, "d"), "left")
      .select(col(keyCol), col("d"),
        last(col("_v"), ignoreNulls = true).over(w).as("v"),
        col("_v").isNull.as("filled"))
  }
}
