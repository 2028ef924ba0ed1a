package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK returns the true cosine top-k") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.7f, 0.7f)), (4L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(vecs.where(col("vec_id") === 0), vecs, 2)
      .select("nid", "rnk").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L) // closest to (1,0) is (0.9,0.1)
    assert(got(3L) == 2L) // then the diagonal
  }

  test("multimodal plumbing: batched extraction with stub decoder") {
    val docs = graft.Tables.load(spark, sf(), "documents").limit(10)
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 10)
    feats.foreach { r =>
      assert(r.getAs[String]("mime") == "text/plain")
      assert(r.getAs[Long]("byte_len") > 0)
      val hist = r.getAs[scala.collection.Seq[Double]]("feature")
      assert(hist.length == 8 && math.abs(hist.sum - 1.0) < 1e-9)
    }
  }
}
