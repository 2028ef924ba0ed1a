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

  // Three well-separated 8-dim clusters; every vector is a jittered copy
  // of one of three prototypes, so a PQ codebook with enough cells must
  // assign clones of the same prototype the same code word.
  private lazy val clustered = {
    val protos = Seq(
      Array(10.0, 0.0, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 5.0, 0.0, 0.0, 0.0, 10.0))
    (0 until 60).map { i =>
      val p = protos(i % 3)
      (i.toLong, p.map(c => (c + 0.01 * ((i * 13 + 7) % 5 - 2)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pq codes separate clusters and distortion shrinks vs 1 cell") {
    // k = #prototypes: seeds are ids 0,1,2 — one per prototype — so each
    // cluster owns exactly one cell (k > #protos would legitimately
    // split one cluster's clones across two cells by jitter)
    val books = Quantize.pqCodebooks(clustered, "vec_id", "embedding",
      m = 2, k = 3, iterations = 3)
    assert(books.length == 2 && books.forall(_.length == 3))
    val enc = Quantize.pqEncode(clustered, "vec_id", "embedding", books)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2)))
    // same-prototype vectors share a code word; different prototypes don't
    val byProto = enc.groupBy(_._1 % 3).map { case (p, rs) => p -> rs.map(_._2).distinct }
    assert(byProto.values.forall(_.size == 1), byProto.toString)
    assert(byProto.values.toSeq.distinct.size == 3)
    // distortion: k=3 codebook beats the degenerate k=1 codebook
    val books1 = Quantize.pqCodebooks(clustered, "vec_id", "embedding",
      m = 2, k = 1, iterations = 3)
    val err3 = enc.map(_._3).sum
    val err1 = Quantize.pqEncode(clustered, "vec_id", "embedding", books1)
      .agg(sum(col("sq_err"))).as[Double].head()
    assert(err3 < err1 / 10, s"err3=$err3 err1=$err1")
  }

  test("pq encode is shuffle-free and codes stay within [0, k)") {
    val books = Quantize.pqCodebooks(clustered, "vec_id", "embedding",
      m = 4, k = 3, iterations = 1)
    val out = Quantize.pqEncode(clustered, "vec_id", "embedding", books)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free encode:\n$plan")
    val codes = out.select(explode(col("codes"))).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 3))
    assert(out.count() == 60)
  }
}
