package graft.batch

import graft.SparkSpec

/** Slice-0 end-to-end (SURVEY §7.2): news+stock masters -> clean -> score
  * -> daily agg -> join -> batch_view, on a hand-checked fixture.
  */
class BatchPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val news = Seq(
    ("2026-08-10", "stocks rally big gain today http://x.co/1"), // pos-heavy
    ("2026-08-10", "severe loss and drop risk ahead"),           // neg-heavy
    ("2026-08-10", "tiny"),                                      // dropped: len<10
    ("2026-08-11", "$AAPL beats expectations #growth up_day"),
    ("2026-08-12", "today partial day should vanish")
  ).toDF("Date", "Text")

  private val stock = Seq(
    ("2026-08-10", 1.0, 2.0, 0.5, 1.5, 100.0),
    ("2026-08-11", 1.5, 2.5, 1.0, 2.0, 200.0),
    ("2026-08-12", 9.0, 9.0, 9.0, 9.0, 900.0), // filtered as "today"
    ("2026-08-13", 3.0, 3.0, 3.0, 3.0, 300.0)  // no news -> inner join drops
  ).toDF("Date", "Open", "High", "Low", "Close", "Volume")

  test("full batch recompute: counts, join, today filter") {
    val out = BatchPipeline.run(news, stock, today = "2026-08-12")
      .orderBy("Date").collect()
    assert(out.map(_.getAs[String]("Date")).toSeq == Seq("2026-08-10", "2026-08-11"))
    val d10 = out(0)
    assert(d10.getAs[Long]("Nbr_article") == 2L)   // "tiny" dropped
    val d11 = out(1)
    assert(d11.getAs[Long]("Nbr_article") == 1L)
    // clean stripped $, #, _ before scoring: "aapl beats expectations
    // growth up day" -> pos hits {beat? no ("beats"), growth, up} = 2
    val n = 6.0 // tokens after clean
    assert(d11.getAs[Double]("Positive") == (2 + 1.0) / (n + 3.0))
  }

  test("pos/neg/neu sum to 1 per day") {
    val out = BatchPipeline.run(news, stock, today = "2026-08-12").collect()
    out.foreach { r =>
      val s = r.getAs[Double]("Positive") + r.getAs[Double]("Negative") + r.getAs[Double]("Neutre")
      assert(math.abs(s - 1.0) < 1e-9)
    }
  }
}
