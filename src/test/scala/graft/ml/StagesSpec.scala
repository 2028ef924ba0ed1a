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

  test("batched model scorer: one init per partition, scores equal the per-row path") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sf(), "documents").limit(300)
      .select(col("doc_id"), col("text").as("Text"))
      .unionByName(Seq((100001L, null: String), (100002L, ""),
        (100003L, "strong gain and weak loss")).toDF("doc_id", "Text"))
      .repartition(5)
    val inits = spark.sparkContext.longAccumulator("model_inits")
    val batched = new BatchedSentimentTransformer("Text", 32, inits)
      .transform(docs)
    val perRow = graft.functions.SentimentFns.withSentiment(
      docs, "Text", "Positive", "Negative", "Neutre")
    // row-for-row equality incl. null-text propagation: batched is the
    // SAME function, served through per-partition loaded state
    val joined = batched.as("b").join(perRow.as("r"), Seq("doc_id"))
    // ONE action: a second execution would re-run the mapPartitions
    // stage and double the init count below
    val mismatches = joined.where(
      not(col("b.Positive") <=> col("r.Positive")) ||
      not(col("b.Negative") <=> col("r.Negative")) ||
      not(col("b.Neutre") <=> col("r.Neutre"))).collect()
    assert(mismatches.isEmpty, mismatches.take(3).mkString("; "))
    // the amortization claim: the "model" loaded once per PARTITION —
    // not per row (303) and not per batch (ceil(rows/32) per partition)
    assert(inits.value == docs.rdd.getNumPartitions.toLong,
      s"${inits.value} inits for ${docs.rdd.getNumPartitions} partitions")
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
