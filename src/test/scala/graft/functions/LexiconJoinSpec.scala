package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The broadcast-lexicon-join scorer must equal the inline IN-list
  * scorer for the same lexicon — it is the same operator at a different
  * lexicon scale (SURVEY §4's dictionary-join note).
  */
class LexiconJoinSpec extends SparkSpec {
  import spark.implicits._

  test("lexicon-join scorer equals the inline scorer") {
    val docs = graft.Tables.load(spark, sf(), "documents").limit(200)
    val lexicon = (
      SentimentFns.DefaultPositive.map(w => (w, "pos")) ++
      SentimentFns.DefaultNegative.map(w => (w, "neg"))).toDF("word", "polarity")

    val viaJoin = SentimentFns.withSentimentLexiconJoin(
        docs, "doc_id", "text", lexicon, "jp", "jn", "ju")
      .select(col("doc_id"), col("jp"), col("jn"), col("ju"))
    val viaInline = SentimentFns.withSentiment(docs, "text", "ip", "in_", "iu")
      .select(col("doc_id"), col("ip"), col("in_"), col("iu"))
    val diff = viaJoin.join(viaInline, Seq("doc_id"))
      .where(col("jp") =!= col("ip") || col("jn") =!= col("in_") || col("ju") =!= col("iu"))
    assert(diff.count() == 0)
  }

  test("null and empty text: join scorer matches inline (null / smoothed 1-3rds)") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, "gain"))
      .toDF("doc_id", "text")
    val lexicon = Seq(("gain", "pos"), ("loss", "neg")).toDF("word", "polarity")
    val viaJoin = SentimentFns.withSentimentLexiconJoin(docs, "doc_id", "text", lexicon)
      .select(col("doc_id"), col("pos"), col("neg"), col("neu"))
    val viaInline = SentimentFns.withSentiment(docs, "text")
      .select(col("doc_id"), col("pos"), col("neg"), col("neu"))
    val j = viaJoin.orderBy("doc_id").collect()
    val i = viaInline.orderBy("doc_id").collect()
    assert(j.toSeq == i.toSeq)
    // null text propagates null scores (not smoothed 1/3s)
    assert(j(0).isNullAt(1) && j(0).isNullAt(2) && j(0).isNullAt(3))
    // empty text = zero tokens => smoothed (0+1)/(0+3)
    assert(j(1).getDouble(1) == 1.0 / 3.0)
  }

  test("duplicate-token docs count every occurrence (bag semantics)") {
    val docs = Seq((1L, "gain gain gain loss x")).toDF("doc_id", "text")
    val lexicon = Seq(("gain", "pos"), ("loss", "neg")).toDF("word", "polarity")
    val r = SentimentFns.withSentimentLexiconJoin(docs, "doc_id", "text", lexicon)
      .select("pos", "neg").as[(Double, Double)].head()
    assert(r._1 == (3 + 1.0) / (5 + 3.0))
    assert(r._2 == (1 + 1.0) / (5 + 3.0))
  }
}
