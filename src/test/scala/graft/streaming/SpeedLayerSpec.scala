package graft.streaming

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The speed layer's keyed cross-stream merge (SURVEY §2.5 J2 + §2.6 A3):
  * two streams upsert disjoint fields of one per-day row; sentiment folds
  * with (x+v)/2; replays are day-scoped and late-tolerant.
  */
class SpeedLayerSpec extends SparkSpec {
  import spark.implicits._

  private def tick(d: String, close: Double) =
    SpeedDelta(d, 0L, Some(Tick(d, None, None, None, Some(close), None, None)), None)
  private def sent(d: String, seq: Long, p: Double) =
    SpeedDelta(d, seq, None, Some(SentimentScore(p, 0.1, 0.2)))

  test("parse: P1-P3 json parsing with permissive nulls") {
    val vals = Seq(
      """{"Date":"2026-08-12","Open":"1.0","High":"2.0","Low":"0.5","Close":"1.5","Volume":"100"}""",
      "not json at all").toDF("value")
    val parsed = SpeedLayer.parseStock(vals)
    assert(parsed.columns.toSeq == Seq("Date", "Open", "High", "Low", "Close", "Adj Close", "Volume"))
    val rows = parsed.collect()
    assert(rows.length == 1) // malformed -> null struct -> dropped
    assert(rows.head.getString(0) == "2026-08-12")
    assert(rows.head.isNullAt(5)) // Adj Close absent -> null
  }

  test("batch merge: disjoint fields union, EW fold in seq order") {
    val deltas = Seq(
      tick("2026-08-10", 101.0),
      sent("2026-08-10", 1, 0.9),
      sent("2026-08-10", 2, 0.5),
      sent("2026-08-10", 3, 0.7),
      tick("2026-08-11", 99.0)).toDS()
    val out = SpeedLayer.mergeDeltas(deltas).collect().map(r => r.date -> r).toMap
    val d10 = out("2026-08-10")
    assert(d10.close.contains(101.0))
    assert(d10.nbrArticle == 3L)
    // (0.9 -> (0.9+0.5)/2=0.7 -> (0.7+0.7)/2=0.7)
    assert(d10.positive.contains(0.7))
    val d11 = out("2026-08-11")
    assert(d11.close.contains(99.0) && d11.nbrArticle == 0L && d11.positive.isEmpty)
  }

  test("full speed topology: raw JSON -> parse -> score on stream -> merge") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    // reference §3.2: sentiment scoring runs ON the stream, per document
    // seq orders the EW fold; with Kafka it is the record offset — for
    // this fixture it derives from the payload (streaming forbids
    // monotonically_increasing_id)
    val scored = graft.functions.SentimentFns
      .withSentiment(SpeedLayer.parseNews(mem.toDF()), "Text", "Positive", "Negative", "Neutre")
      .withColumn("seq", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("Text")).cast("long"))
    val q = SpeedLayer.mergeDeltas(SpeedLayer.newsDeltas(scored)).toDF()
      .writeStream.format("memory").queryName("speed_full_t")
      .outputMode("append").start()

    mem.addData(
      """{"Date":"2026-08-10","Text":"stocks rally strong gain big growth today"}""",
      """{"Date":"2026-08-10","Text":"heavy loss and risk of decline ahead now"}""",
      "garbage")
    q.processAllAvailable()
    q.stop()

    val row = spark.table("speed_full_t")
      .where(org.apache.spark.sql.functions.col("date") === "2026-08-10")
      .collect().last
    assert(row.getAs[Long]("nbrArticle") == 2L) // garbage dropped by parse
    // doc1: 7 toks, pos hits {rally,strong,gain,big,growth}=5 -> (5+1)/10
    // doc2: 8 toks, pos hits 0 -> 1/11; EW = ((6/10) + (1/11))/2
    val expected = (6.0 / 10.0 + 1.0 / 11.0) / 2.0
    assert(math.abs(row.getAs[Double]("positive") - expected) < 1e-12)
  }

  test("streaming merge: state persists across micro-batches (late merge)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SpeedDelta]
    val q = SpeedLayer.mergeDeltas(mem.toDS())
      .writeStream.format("memory").queryName("speed_view_t")
      .outputMode("append").start()

    mem.addData(tick("2026-08-10", 100.0), sent("2026-08-10", 1, 0.8))
    q.processAllAvailable()
    mem.addData(sent("2026-08-10", 2, 0.4)) // late arrival for same day
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("speed_view_t")
      .orderBy("date").collect()
    // second emission of the same day must carry folded state:
    // 0.8 -> (0.8+0.4)/2 = 0.6, nbr 2, close still 100.0
    val last = rows.last
    assert(last.getAs[String]("date") == "2026-08-10")
    assert(last.getAs[Long]("nbrArticle") == 2L)
    assert(last.getAs[Double]("positive") == (0.8 + 0.4) / 2.0)
    assert(last.getAs[Double]("close") == 100.0)
  }
}
