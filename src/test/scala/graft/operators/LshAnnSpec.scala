package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LSH-bucketed ANN: structural correctness (sims are true cosines,
  * ranks ordered) — recall is data-dependent by design, so it is
  * reported, not asserted tightly.
  */
class LshAnnSpec extends SparkSpec {

  test("IVF ANN probes cells, returns true cosines, reports recall") {
    val emb = graft.Tables.load(spark, sf(), "embeddings")
    val qs = emb.where(col("vec_id") >= 100 && col("vec_id") < 110)
    val ivf = Similarity.ivfTopK(qs, emb, k = 5, nCells = 8, nProbe = 3)
    assert(ivf.count() > 0)
    val brute = Similarity.bruteForceTopK(qs, emb, k = 5)
      .select(col("qid").as("bqid"), col("nid").as("bnid"))
    // sims are exact cosines for returned pairs
    val all = Similarity.bruteForceTopK(qs, emb, k = 1000000)
      .select(col("qid").as("aqid"), col("nid").as("anid"), col("sim").as("asim"))
    val bad = ivf.join(all, col("qid") === col("aqid") && col("nid") === col("anid"), "left")
      .where(col("asim").isNull || col("sim") =!= col("asim")).count()
    assert(bad == 0)
    val hits = ivf.join(brute, col("qid") === col("bqid") && col("nid") === col("bnid"), "left_semi").count()
    info(s"IVF recall@5 over 10 queries: $hits/50") // reported, data-dependent
  }

  test("bucketed ANN returns true cosine values in rank order") {
    val emb = graft.Tables.load(spark, sf(), "embeddings")
    val qs = emb.where(col("vec_id") < 20)
    val ann = Similarity.lshBucketTopK(qs, emb, k = 5, nBits = 4)
    val brute = Similarity.bruteForceTopK(qs, emb, k = 1000000)
      .select(col("qid").as("bqid"), col("nid").as("bnid"), col("sim").as("bsim"))
    val joined = ann.join(brute,
      col("qid") === col("bqid") && col("nid") === col("bnid"), "left")
    assert(ann.count() > 0)
    // every ANN sim equals the exact cosine for that pair
    assert(joined.where(col("bsim").isNull || col("sim") =!= col("bsim")).count() == 0)
    // ranks are 1..k without gaps per query, ordered by sim desc
    val badRank = ann.groupBy("qid")
      .agg(max(col("rnk")).as("mx"), count(lit(1)).as("n"))
      .where(col("mx") =!= col("n"))
    assert(badRank.count() == 0)
  }
}
