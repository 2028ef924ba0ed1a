package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.0f, -1.0f, 5.0f)),
    (2L, Array(1.0f, 1.0f, 5.0f)),   // dim 3 constant across corpus
    (3L, Array(0.5f, 0.0f, 5.0f))
  ).toDF("vec_id", "embedding")

  test("codebook computes per-dimension min/max") {
    val book = Quantize.codebook(vecs, "embedding")
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(book.toSeq == Seq((0, 0.0, 1.0), (1, -1.0, 1.0), (2, 5.0, 5.0)))
  }

  test("codes hit the range endpoints and constant dims encode to 0") {
    val got = Quantize.scalarQuantize(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(0, 0, 0))
    assert(got(2L) == Seq(255, 255, 0))
    // 0.5 of [0,1] -> 127.5 -> floor(+0.5) = 128; 0.0 of [-1,1] -> 127.5+0.5 -> 128
    assert(got(3L) == Seq(128, 128, 0))
  }

  test("max reconstruction error is bounded by half a quantization step") {
    val n = 200
    val rng = new scala.util.Random(7)
    val big = (0 until n).map(i => (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val book = Quantize.codebook(big, "embedding")
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val maxStep = book.map { case (_, mn, mx) => (mx - mn) / 255.0 / 2.0 }.max
    val worst = Quantize.scalarQuantize(big, "vec_id", "embedding")
      .agg(max(col("max_err"))).as[Double].head()
    assert(worst <= maxStep + 1e-12, s"worst=$worst step/2=$maxStep")
    assert(worst > 0.0)
  }

  test("encode stage is shuffle-free (no Exchange above the scan)") {
    val out = Quantize.scalarQuantize(vecs, "vec_id", "embedding")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free encode:\n$plan")
  }
}
