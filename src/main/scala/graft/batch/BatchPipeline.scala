package graft.batch

import graft.functions.{SentimentFns, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The batch layer's daily recompute (reference: airflow/dags/Batch_layer/
  * batchPipeline.py — masters -> clean -> sentiment -> daily agg -> join
  * stock -> batch_view), as composable DataFrame => DataFrame stages.
  * Everything is native expressions: the Python-UDF barrier the reference
  * pays (BatchEvalPython around CleanNews) does not exist here, so the
  * whole pipeline is one codegen'd plan with a single shuffle (the daily
  * aggregate) plus a broadcast join.
  */
object BatchPipeline {

  /** U1 CleanNews (batchPipeline.py:41-66): clean text, drop null/short
    * rows. Input needs columns (Date, Text).
    */
  def cleanNews(news: DataFrame): DataFrame =
    news.withColumn("Text", TextFns.cleanText(col("Text")))
      .na.drop(Seq("Date", "Text"))

  /** U3-U6 sentiment stage (batchPipeline.py:134-160): per-doc pos/neg/neu. */
  def scoreNews(cleaned: DataFrame): DataFrame =
    SentimentFns.withSentiment(cleaned, "Text", "Positive", "Negative", "Neutre")
      .withColumn("Nbr_article", lit(1))

  /** U2/A1 AggNews (batchPipeline.py:69-94): daily count + mean scores.
    * One hash shuffle on Date; partial aggregation runs map-side.
    */
  def aggDaily(scored: DataFrame): DataFrame =
    scored.groupBy(col("Date"))
      .agg(sum(col("Nbr_article")).as("Nbr_article"),
        avg(col("Positive")).as("Positive"),
        avg(col("Negative")).as("Negative"),
        avg(col("Neutre")).as("Neutre"))

  /** J1 + P6/P4/F1/F2 (batchPipeline.py:129,163-167): join the daily
    * stock series with the daily news features, drop incomplete rows,
    * drop today's partial day. The aggregated news side is O(days) —
    * broadcast it explicitly rather than trusting size estimation.
    */
  def joinStock(stock: DataFrame, aggNews: DataFrame, today: String): DataFrame =
    stock.withColumnRenamed("Date", "DateStock")
      .join(broadcast(aggNews), col("DateStock") === col("Date"), "inner")
      .select(col("Date"), col("Open"), col("High"), col("Low"), col("Close"),
        col("Volume"), col("Nbr_article"), col("Positive"), col("Negative"),
        col("Neutre"))
      .na.drop()
      .filter(col("Date") =!= lit(today))

  /** Full batch recompute: news+stock masters in, batch_view out. */
  def run(news: DataFrame, stock: DataFrame, today: String): DataFrame =
    joinStock(stock, aggDaily(scoreNews(cleanNews(news))), today)
}
