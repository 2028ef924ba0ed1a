package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("signProject: exact integer projection, driver-replayed; zero shuffles") {
    val vecs = Seq(
      (0L, Seq(0.5f, -1.25f, 2.0f)),
      (1L, Seq(0.0f, 0.001f, -0.0015f))).toDF("vec_id", "embedding")
    val outDim = 4
    val got = Similarity.signProject(vecs, "vec_id", "embedding", outDim)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // driver replay of the exact contract (the full 4-step mixer)
    def sign(i: Long, j: Long): Long = {
      val h1 = ((i * outDim + j + 1) * 1103515245L + 12345L) % 2147483648L
      val h2 = h1 ^ (h1 >> 13)
      val h3 = (h2 * 69069L + 1L) % 2147483648L
      val h4 = h3 ^ (h3 >> 7)
      1L - 2L * ((h4 >> 12) & 1L)
    }
    val ref = for {
      (id, vs) <- Seq(0L -> Seq(0.5f, -1.25f, 2.0f),
        1L -> Seq(0.0f, 0.001f, -0.0015f))
      j <- 0 until outDim
    } yield (id, j) -> vs.zipWithIndex.map { case (v, i) =>
      math.floor(v.toDouble * 1000).toLong * sign(i, j)
    }.sum
    assert(got == ref.toMap)
    // the corpus never shuffles: no Exchange anywhere in the plan
    val plan = Similarity.signProject(vecs, "vec_id", "embedding", outDim)
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, plan.toString)
  }

  test("signProject: norms concentrate around outDim * ||q||^2 (JL property)") {
    // E[(sum_i q_i s_ij)^2] = ||q||^2 per output coordinate, so
    // ||proj||^2 / (outDim * ||q||^2) concentrates around 1 with
    // ~1/sqrt(outDim) spread. (A distance-ORDER test is meaningless on
    // this corpus: isotropic synthetic vectors concentrate all pairwise
    // distances, so their order carries no signal to preserve.)
    val emb = graft.Tables.load(spark, sf(), "embeddings")
    val outDim = 16
    val proj = Similarity.signProject(emb, "vec_id", "embedding", outDim)
      .groupBy("vec_id")
      .agg(sum(col("v") * col("v")).as("p2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    val q2 = emb.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1)
        .map(v => math.floor(v.toDouble * 1000)).map(x => x * x).sum
    }.toMap
    val ratios = q2.collect { case (id, n2) if n2 > 0 =>
      proj(id) / (outDim * n2) }.toSeq
    assert(ratios.nonEmpty)
    val within = ratios.count(r => r > 0.35 && r < 2.5).toDouble / ratios.size
    assert(within > 0.9, s"JL concentration violated: $within within band, " +
      s"median ${ratios.sorted.apply(ratios.size / 2)}")
  }

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

  test("pqAdcTopK: recall vs exact L2 on clustered vectors; plan broadcasts") {
    // 3 well-separated prototypes x 20 jittered clones, 8 dims
    val protos = Seq(
      Array(10.0, 0.0, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 5.0, 0.0, 0.0, 0.0, 10.0))
    val data = (0 until 60).map { i =>
      val p = protos(i % 3)
      (i.toLong, p.map(c => (c + 0.03 * ((i * 13 + 7) % 5 - 2)).toFloat).toSeq)
    }
    val corpus = data.toDF("vec_id", "embedding")
    val books = Quantize.pqCodebooks(corpus, "vec_id", "embedding",
      m = 2, k = 3, iterations = 3)
    val codes = Quantize.pqEncode(corpus, "vec_id", "embedding", books)
      .select(col("vec_id"), col("codes"))
    val queries = corpus.where(col("vec_id") < 3)
    val adc = Similarity.pqAdcTopK(queries, codes, k = 5, books)
    val got = adc.select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Cluster-level recall is PERFECT: every ADC hit is an exact-L2
    // top-19 member (the query's own cluster). Within the cluster all
    // clones share one PQ code, so ADC distances tie and rank by nid —
    // the expected resolution limit of m=2/k=3 codes; finer ordering
    // is below quantization resolution by construction, so the
    // deterministic tie-broken result (5 smallest same-cluster ids) is
    // pinned exactly.
    got.foreach { case (qid, nids) =>
      val expect = (0L until 60L).filter(n => n % 3 == qid % 3 && n != qid)
        .sorted.take(5).toSet
      assert(nids == expect, s"q$qid -> $nids, expect $expect")
    }
    // corpus side must not shuffle: queries broadcast
    val plan = adc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast query side:\n$plan")
  }

  test("sq8AdcTopK: byte-code search stays in-cluster, recall vs exact cosine") {
    val protos = Seq(
      Array(10.0, 0.0, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 5.0, 0.0, 0.0, 0.0, 10.0))
    val corpus = (0 until 60).map { i =>
      val p = protos(i % 3)
      (i.toLong, p.map(c => (c + 0.03 * ((i * 13 + 7) % 5 - 2)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val book = Quantize.sq8Params(corpus, "embedding")
    val codes = Quantize.scalarQuantize(corpus, "vec_id", "embedding")
      .select(col("vec_id"), col("codes"))
    val queries = corpus.where(col("vec_id") < 3)
    val adc = Similarity.sq8AdcTopK(queries, codes, k = 5, book)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    adc.foreach { case (qid, nids) =>
      // in-cluster always; >= 3/5 overlap with exact cosine (SQ8's
      // per-dim error ~range/255 can swap the within-cluster tail)
      assert(nids.forall(n => n % 3 == qid % 3), s"q$qid -> $nids")
      assert((nids & exact(qid)).size >= 3,
        s"q$qid adc $nids vs exact ${exact(qid)}")
    }
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

  test("hardNegativeTopK excludes same-label vectors, else matches brute force") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), "a"),
      (1L, Array(0.99f, 0.14f), "a"), // nearest overall but same label
      (2L, Array(0.9f, 0.43f), "b"),
      (3L, Array(0.0f, 1.0f), "b"),
      (4L, Array(-1.0f, 0.0f), "c")
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegativeTopK(
        vecs.where(col("vec_id") === 0), vecs, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // same-label vec 1 is skipped; order: 2 (closest), 3, 4
    assert(got.toSeq == Seq((2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("maxSimTopK: per-query-token best alignment, summed; self-doc excluded") {
    // doc 0 = query: tokens along x and y; doc 1 matches both axes
    // exactly; doc 2 matches only x; doc 3 is orthogonal to everything
    val tok = Seq(
      (0L, 0L, Array(1.0f, 0.0f, 0.0f)), (0L, 1L, Array(0.0f, 1.0f, 0.0f)),
      (1L, 10L, Array(1.0f, 0.0f, 0.0f)), (1L, 11L, Array(0.0f, 1.0f, 0.0f)),
      (2L, 20L, Array(1.0f, 0.0f, 0.0f)), (2L, 21L, Array(0.0f, 0.0f, 1.0f)),
      (3L, 30L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("doc", "tok", "embedding")
    val got = Similarity.maxSimTopK(tok.where(col("doc") === 0), tok, k = 3)
      .collect().map(r => (r.getLong(1), r.getAs[Double]("sim"), r.getLong(3)))
    // doc1: 1+1 = 2; doc2: 1+0 = 1; doc3: 0+0 = 0
    assert(got.toSeq == Seq((1L, 2.0, 1L), (2L, 1.0, 2L), (3L, 0.0, 3L)))
  }

  test("recallAtK: full overlap = 1.0, partial counted, missing query = 0.0") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L), (3L, 31L))
      .toDF("qid", "nid")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L))
      .toDF("qid", "nid") // q3 absent entirely
    val got = Similarity.recallAtK(approx, exact, k = 2)
      .collect().map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Double]("recall")))).toMap
    assert(got(1L) == ((2L, 1.0)))
    assert(got(2L) == ((1L, 0.5)))
    assert(got(3L) == ((0L, 0.0)))
  }
}
