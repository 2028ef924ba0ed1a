package graft.queries

import graft.Tables
import graft.functions.NumFns
import graft.serving.{ArxForecaster, ServingJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end lambda-pipeline queries over the testdata: the batch
  * recompute and the serving forecast, run against synthetic
  * news/stock frames derived from `documents`/`lineitem`.
  */
object PipelineQueries {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** documents -> (Date, Text) news master: deterministic synthetic dates
    * keyed off doc_id (30-day cycle).
    */
  private def newsMaster(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      date_format(date_add(lit("1997-01-01").cast("date"),
        (col("doc_id") % 30).cast("int")), "yyyy-MM-dd").as("Date"),
      col("text").as("Text"))

  /** lineitem daily aggregate -> OHLCV-shaped stock master. */
  private def stockMaster(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(to_date(col("l_shipdate")).between("1997-01-01", "1997-01-30"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("Date"))
      .agg(min(col("l_extendedprice")).as("Low"),
        max(col("l_extendedprice")).as("High"),
        NumFns.stableRound(sum(col("l_extendedprice")), 4).as("Open"),
        NumFns.stableRound(avg(col("l_extendedprice")), 4).as("Close"),
        sum(col("l_quantity")).as("Volume"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §3.1 batch recompute end-to-end: clean -> score -> daily agg ->
    // join stock -> batch_view rows. The oracle replays the identical
    // dataflow in SQL (avgs rounded in both).
    "q25_batch_pipeline" -> ((s, dir) => {
      val agg = graft.batch.BatchPipeline.aggDaily(
        graft.batch.BatchPipeline.scoreNews(
          graft.batch.BatchPipeline.cleanNews(newsMaster(s, dir))))
      graft.batch.BatchPipeline.joinStock(stockMaster(s, dir), agg, today = "1997-01-30")
        .select(col("Date"), col("Open"), col("High"), col("Low"), col("Close"),
          col("Volume"), col("Nbr_article").cast("long").as("Nbr_article"),
          NumFns.stableRound(col("Positive"), 6).as("Positive"),
          NumFns.stableRound(col("Negative"), 6).as("Negative"),
          NumFns.stableRound(col("Neutre"), 6).as("Neutre"))
    }),

    // §3.3 serving forecast: ARX(2) one-step-ahead on the daily order
    // totals with exogenous order counts. Driver-side on O(days) rows by
    // design; rows-only check (no SQL oracle for the solver).
    "q26_forecast" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(col("o_totalprice")).as("total"),
          count(lit(1)).cast("double").as("n_orders"))
        .where(col("d").between("1995-01-01", "1995-12-31"))
        .withColumn("d", date_format(col("d"), "yyyy-MM-dd"))
      ServingJob.run(s, daily, "d", "total", Seq("n_orders"),
          horizonDate = "1996-01-01", new ArxForecaster(p = 2))
        .select(col("d"), round(col("total_pred"), 4).as("total_pred"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q25_batch_pipeline" -> {
      val pos = graft.functions.SentimentFns.DefaultPositive.map(w => s"'$w'").mkString("[", ", ", "]")
      val neg = graft.functions.SentimentFns.DefaultNegative.map(w => s"'$w'").mkString("[", ", ", "]")
      // date cycle, clean gate (len>=10), sentiment, daily agg, stock join
      s"""WITH news AS (
            SELECT strftime(DATE '1997-01-01' + INTERVAL (doc_id % 30) DAY, '%Y-%m-%d') AS d,
                   ${SqlFragments.cleanExpr} AS clean
            FROM documents WHERE text IS NOT NULL AND LENGTH(text) >= 10),
          toks AS (
            SELECT d, list_filter(regexp_split_to_array(lower(clean), '\\s+'), x -> length(x) > 0) AS tk
            FROM news WHERE clean IS NOT NULL),
          scored AS (
            SELECT d, CAST(len(tk) AS DOUBLE) AS n,
                   CAST(len(list_filter(tk, x -> list_contains($pos, x))) AS DOUBLE) AS pc,
                   CAST(len(list_filter(tk, x -> list_contains($neg, x))) AS DOUBLE) AS nc
            FROM toks),
          agg AS (
            SELECT d, COUNT(*) AS nbr,
                   AVG((pc + 1.0) / (n + 3.0)) AS p,
                   AVG((nc + 1.0) / (n + 3.0)) AS ng,
                   AVG((n - pc - nc + 1.0) / (n + 3.0)) AS nu
            FROM scored GROUP BY d),
          stock AS (
            SELECT strftime(l_shipdate, '%Y-%m-%d') AS ds,
                   MIN(l_extendedprice) AS Low,
                   MAX(l_extendedprice) AS High,
                   ${SqlFragments.r15("SUM(l_extendedprice)", 4)} AS Open,
                   ${SqlFragments.r15("AVG(l_extendedprice)", 4)} AS Close,
                   SUM(l_quantity) AS Volume
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-01-30'
            GROUP BY 1)
          SELECT agg.d AS "Date", Open, High, Low, Close, Volume,
                 CAST(nbr AS BIGINT) AS Nbr_article,
                 ${SqlFragments.r15("p", 6)} AS Positive, ${SqlFragments.r15("ng", 6)} AS Negative, ${SqlFragments.r15("nu", 6)} AS Neutre
          FROM stock JOIN agg ON stock.ds = agg.d
          WHERE agg.d <> '1997-01-30'"""
    }
  )
}
