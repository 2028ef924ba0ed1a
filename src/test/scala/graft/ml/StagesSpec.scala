package graft.ml

import graft.SparkSpec
import graft.batch.BatchPipeline
import org.apache.spark.ml.Pipeline

/** U6: ML Pipeline composition equals the plain function composition
  * (the reference composes CleanNews/annotators/AggNews in a
  * pyspark.ml Pipeline; fit is a no-op for estimator-free stages).
  */
class StagesSpec extends SparkSpec {
  import spark.implicits._

  test("Pipeline(clean -> sentiment -> agg) == BatchPipeline stages") {
    val news = Seq(
      ("2026-08-10", "stocks rally big gain today http://x.co/1"),
      ("2026-08-10", "severe loss and drop risk ahead"),
      ("2026-08-10", "tiny"),
      ("2026-08-11", "$AAPL beats expectations #growth up_day")).toDF("Date", "Text")

    val viaPipeline = new Pipeline().setStages(Array(
        new CleanNewsTransformer(), new SentimentTransformer(), new AggNewsTransformer()))
      .fit(news).transform(news)
      .orderBy("Date").collect()

    val viaFunctions = BatchPipeline.aggDaily(
        BatchPipeline.scoreNews(BatchPipeline.cleanNews(news)))
      .orderBy("Date").collect()

    assert(viaPipeline.length == viaFunctions.length && viaPipeline.length == 2)
    viaPipeline.zip(viaFunctions).foreach { case (a, b) => assert(a == b) }
  }

  test("UDF fidelity variant equals the native clean expression") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sf(), "documents").limit(200)
      .select(col("text"))
      .unionByName(Seq("$A #b_c http://url.x @men rest of text 😀 here",
        "short", "  padded_text with $ #tags and www.link.co trailing  ")
        .toDF("text"))
    val diff = docs
      .withColumn("native", graft.functions.TextFns.cleanText(col("text")))
      .withColumn("viaUdf", graft.functions.TextFns.cleanTextUdf(col("text")))
      .where(not(col("native") <=> col("viaUdf")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }
}
