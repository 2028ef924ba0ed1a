package graft.serving

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The serving layer (reference: airflow/dags/Serving_layer/
  * prediction.py): range-scan the materialized views, collect the O(days)
  * feature rows (the ONLY driver-side collect in the engine — SURVEY
  * §7.6), one-step forecast, emit a single serving row.
  */
object ServingJob {

  /** S3 range scan: Date-partition-pruned view read, replacing the
    * reference's es.query server-side range (prediction.py:37-47).
    */
  def rangeScan(view: DataFrame, dateCol: String, lo: String, hi: String): DataFrame =
    view.where(col(dateCol).between(lo, hi))

  /** Forecast the next value of `targetCol` from a daily feature frame.
    * @param history daily rows; must contain dateCol, targetCol, exogCols
    * @return (nextDateLabel, prediction)
    */
  def forecast(history: DataFrame, dateCol: String, targetCol: String,
               exogCols: Seq[String], forecaster: Forecaster): Double = {
    val rows: Array[Row] = history
      .select((dateCol +: targetCol +: exogCols).map(col): _*)
      .orderBy(col(dateCol)) // explicit ordering — the reference relies on
                             // store order (prediction.py:70-73)
      .collect()
    val y = rows.map(_.getDouble(1))
    val exog = rows.map(r => exogCols.indices.map(i => r.getDouble(2 + i)).toArray)
    forecaster.predictNext(y, exog)
  }

  /** Reference-fidelity serving row (prediction.py:76): the predicted
    * close OVERWRITES the observed close in today's speed row — the
    * served document deliberately shows the forecast, not the
    * observation. (Also of note for fidelity: the reference loads the
    * batch history at prediction.py:51-60 but never passes it to the
    * model; only today's exogenous row is used.)
    */
  def serveWithPredictedClose(speedToday: DataFrame, pred: Double): DataFrame =
    speedToday.withColumn("Close", lit(pred))

  /** Full serving step as a one-row DataFrame (Date, Close_pred) — the
    * reference writes the predicted Close over the observed one
    * (prediction.py:76).
    */
  def run(spark: SparkSession, history: DataFrame, dateCol: String,
          targetCol: String, exogCols: Seq[String], horizonDate: String,
          forecaster: Forecaster = new ArxForecaster()): DataFrame = {
    import spark.implicits._
    val pred = forecast(history, dateCol, targetCol, exogCols, forecaster)
    Seq((horizonDate, pred)).toDF(dateCol, s"${targetCol}_pred")
  }
}
