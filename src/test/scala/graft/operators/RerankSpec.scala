package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RerankSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    (0 until a.length).foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
    }
    d / math.sqrt(na * nb)
  }

  test("mmrRerank: relevance-only first pick, then redundancy-penalized picks") {
    // candidates: two near-duplicates with top relevance, one diverse
    // mid-relevance item. Plain top-k would take both near-dups; MMR at
    // λ=0.5 must pick the diverse item second.
    val e1 = Array(1.0f, 0.0f)
    val e1b = Array(0.999f, 0.045f) // ~e1, near-duplicate
    val e2 = Array(0.0f, 1.0f)      // orthogonal
    val cands = Seq(
      (7L, 1L, 0.98, e1), (7L, 2L, 0.97, e1b), (7L, 3L, 0.80, e2))
      .toDF("qid", "nid", "rel", "embedding")
    val out = Rerank.mmrRerank(cands, k = 3, lambda = 0.5)
      .orderBy("step").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 2L), out.mkString(", "))
    // replay the scores: step1 = λ·rel; step2 diverse item beats the
    // near-dup because its max-sim to {e1} is ~0
    assert(math.abs(out(0)._3 - 0.5 * 0.98) < 1e-12)
    assert(math.abs(out(1)._3 - (0.5 * 0.80 - 0.5 * cos(e2, e1))) < 1e-12)
    assert(math.abs(out(2)._3 - (0.5 * 0.97 - 0.5 * cos(e1b, e1))) < 1e-12)
  }

  test("mmrRerank: ties break by smallest nid; k > candidates is safe") {
    val e = Array(1.0f, 0.0f)
    val cands = Seq((1L, 9L, 0.5, e), (1L, 4L, 0.5, e))
      .toDF("qid", "nid", "rel", "embedding")
    val out = Rerank.mmrRerank(cands, k = 5, lambda = 1.0)
      .orderBy("step").collect().map(_.getLong(1))
    // identical scores at every step -> ascending nid order; only 2 rows
    assert(out.toSeq == Seq(4L, 9L))
  }

  test("mmrRerank: per-query independence") {
    val ex = Array(1.0f, 0.0f); val ey = Array(0.0f, 1.0f)
    val cands = Seq(
      (1L, 1L, 0.9, ex), (1L, 2L, 0.8, ey),
      (2L, 3L, 0.7, ey), (2L, 4L, 0.6, ex))
      .toDF("qid", "nid", "rel", "embedding")
    val out = Rerank.mmrRerank(cands, k = 1, lambda = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L))
  }
}
