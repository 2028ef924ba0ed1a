package graft

import graft.batch.BatchPipeline
import graft.model._
import graft.serving.{ArxForecaster, ServingJob}
import graft.sources.ViewStore
import graft.streaming.{Ingest, SpeedLayer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The full lambda tour (SURVEY §3): streaming ingest -> masters ->
  * batch recompute -> batch_view; speed stream -> stateful merge ->
  * speed_view; serving range-scan -> forecast. All through the real
  * sinks (partitioned parquet views) with checkpoints.
  */
class LambdaE2ESpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft_views_").toString
  private lazy val store = new ViewStore(spark, root)

  private def stockJson(d: String, c: Double) =
    s"""{"Date":"$d","Open":"${c - 1}","High":"${c + 1}","Low":"${c - 2}","Close":"$c","Volume":"1000"}"""

  test("ingest: streaming append of parsed masters with checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(
      stockJson("2026-08-10", 100.0),
      stockJson("2026-08-10", 101.0), // same-day re-send: last wins (keyed)
      stockJson("2026-08-11", 102.0),
      "garbage not json")
    val q = Ingest.startMasterAppend(
      SpeedLayer.parseStock(mem.toDF()), store, "stock_master", "Date",
      s"$root/_cp_stock", keyed = true, trigger = Trigger.AvailableNow())
    q.awaitTermination()

    val rows = store.read("stock_master").orderBy("Date").collect()
    assert(rows.length == 2) // keyed: one row per date, garbage dropped
    assert(rows.head.getAs[String]("Close") == "101.0")
  }

  test("speed layer: stream merge into speed_view is replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SpeedDelta]
    mem.addData(
      SpeedDelta("2026-08-10", 0, Some(Tick("2026-08-10", None, None, None, Some(100.0), None, Some(1000.0))), None),
      SpeedDelta("2026-08-10", 1, None, Some(SentimentScore(0.8, 0.1, 0.1))),
      SpeedDelta("2026-08-10", 2, None, Some(SentimentScore(0.4, 0.3, 0.3))))
    val q = Ingest.startSpeedView(
      SpeedLayer.mergeDeltas(mem.toDS()).toDF(), store, "speed_view",
      s"$root/_cp_speed", trigger = Trigger.AvailableNow())
    q.awaitTermination()

    val row = store.read("speed_view").where(col("date") === "2026-08-10").collect().head
    assert(row.getAs[Long]("nbrArticle") == 2L)
    assert(row.getAs[Double]("positive") == (0.8 + 0.4) / 2.0)

    // replay the same merge (micro-batch redelivery): state of the view
    // must not change (idempotent keyed sink, T6)
    val again = SpeedLayer.mergeDeltas(Seq(
      SpeedDelta("2026-08-10", 0, Some(Tick("2026-08-10", None, None, None, Some(100.0), None, Some(1000.0))), None),
      SpeedDelta("2026-08-10", 1, None, Some(SentimentScore(0.8, 0.1, 0.1))),
      SpeedDelta("2026-08-10", 2, None, Some(SentimentScore(0.4, 0.3, 0.3)))).toDS())
    store.merge("speed_view", again.toDF(), "date")
    val row2 = store.read("speed_view").where(col("date") === "2026-08-10").collect()
    assert(row2.length == 1)
    assert(row2.head.getAs[Double]("positive") == (0.8 + 0.4) / 2.0)
  }

  test("batch + serving: recompute view, range-scan, forecast") {
    val news = (1 to 40).map { i =>
      val d = f"2026-07-${i % 10 + 1}%02d"
      (d, s"stocks rally big gain number $i with strong growth")
    }.toDF("Date", "Text")
    val stock = (1 to 10).map { i =>
      val d = f"2026-07-$i%02d"
      (d, 10.0 + i, 12.0 + i, 9.0 + i, 11.0 + i, 1000.0 * i)
    }.toDF("Date", "Open", "High", "Low", "Close", "Volume")

    store.overwrite("batch_view",
      BatchPipeline.run(news, stock, today = "2026-07-31"), "Date")

    val hist = store.rangeScan("batch_view", "Date", "2026-07-01", "2026-07-09")
      .select(col("Date").as("d"), col("Close").as("y"),
        col("Nbr_article").cast("double").as("n"))
    assert(hist.count() == 9)
    val served = ServingJob.run(spark, hist, "d", "y", Seq("n"),
      horizonDate = "2026-07-10", new ArxForecaster(p = 2))
    val pred = served.collect().head.getDouble(1)
    // Close is linear (11+i): one-step-ahead should continue the trend
    assert(math.abs(pred - 20.0) < 1.5)
    store.append("serving_view", served.withColumnRenamed("d", "Date"), "Date")
    assert(store.read("serving_view").count() == 1)
  }
}
