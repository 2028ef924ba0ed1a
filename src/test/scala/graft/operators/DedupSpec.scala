package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),   // near dup
    (4L, "completely different content about spark engines and batch jobs"),
    (5L, "another unrelated snippet regarding window aggregation semantics")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length == 4)
    val dup = out.find(_.getAs[Long]("dup_cnt") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash: identical docs share full signature; estimate tracks jaccard") {
    val sigs = Dedup.minHashSignatures(docs, "text", 32)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val est34 = sigs(3L).zip(sigs(4L)).count { case (a, b) => a == b } / 32.0
    val est13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } / 32.0
    assert(est13 > est34) // near-dup pair more similar than unrelated pair
  }

  test("minhash LSH surfaces the exact and near dup as candidates") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text")
      .select("a_id", "b_id", "jaccard_est").as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("simhash: hamming(near dups) < hamming(unrelated)") {
    val sh = Dedup.simHash(docs, "text").select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L))
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)))
  }

  test("embedding LSH near-dup: identical vectors pair at sim 1.0; bucket-capped; pinned to all-pairs truth") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(1.0f, 0.0f, 0.5f, 0.2f)),      // exact dup of 1
      (3L, Array(0.9f, 0.1f, 0.5f, 0.2f)),      // near dup of 1
      (4L, Array(-1.0f, 0.3f, -0.8f, 0.1f)),    // far from everything
      (5L, Array(0.0f, 1.0f, -0.2f, 0.9f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupLsh(vecs, "vec_id", "embedding",
        nBits = 2, simThreshold = 0.9)
      .select("a_id", "b_id", "sim").as[(Long, Long, Double)].collect()
    val dup = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(dup.isDefined && dup.get._3 == 1.0)
    // every emitted pair really clears the threshold, and every
    // SAME-BUCKET all-pairs-truth pair above it is emitted (candidate
    // completeness within buckets — what LSH guarantees)
    assert(pairs.forall(_._3 >= 0.9))
    val sig = Similarity.lshSignature(col("embedding"), 2)
    val bySig = vecs.withColumn("b", sig).select("vec_id", "b")
      .as[(Long, Long)].collect().toMap
    val vmap = vecs.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (d, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, na, nb), (x, y)) => (d + x * y, na + x * x, nb + y * y)
      }
      d / math.sqrt(na * nb)
    }
    val truth = (for {
      a <- vmap.keys; b <- vmap.keys
      if a < b && bySig(a) == bySig(b) && cos(vmap(a), vmap(b)) >= 0.9
    } yield (a, b)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == truth)
    // cap: buckets above maxBucket emit NO pairs (skew guard), smaller
    // buckets still emit all theirs
    val cap = 3
    val sizes = bySig.values.groupBy(identity).view.mapValues(_.size).toMap
    val cappedTruth = (for {
      a <- vmap.keys; b <- vmap.keys
      if a < b && bySig(a) == bySig(b) && sizes(bySig(a)) <= cap
    } yield (a, b)).toSet
    val capped = Dedup.embeddingNearDupLsh(vecs, "vec_id", "embedding",
        nBits = 2, simThreshold = -1.0, maxBucket = cap)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(capped == cappedTruth)
  }

  test("ngram jaccard: dup pair scores 1.0 within block") {
    val blocked = docs.withColumn("blk", lit(1))
    val pairs = Dedup.ngramJaccardPairs(blocked, "doc_id", "text", Seq("blk"))
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 1.0)
    val near = pairs.find(p => p._1 == 1L && p._2 == 3L).get._3
    val far = pairs.find(p => p._1 == 1L && p._2 == 4L).get._3
    assert(near > far)
  }

  test("repeated spans: shared passage found maximally at its positions") {
    // a 10-token passage planted at position 3 of doc 1 and position 0 of
    // doc 2; surrounding text unique per doc
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    val spans = Seq(
      (1L, s"u1a u1b u1c $passage u1d u1e u1f"),
      (2L, s"$passage u2a u2b u2c u2d"),
      (3L, "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11 v12")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(spans, "doc_id", "text",
        k = 3, minSpanTokens = 5, maxBucket = 16)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // exactly one maximal span: docs (1,2), 10 tokens, at (3, 0)
    assert(got == Set((1L, 2L, 3L, 0L, 10L)), got.toString)
  }

  test("repeated spans: sub-minimum overlaps and stop-gram buckets drop out") {
    val spans = Seq(
      (1L, "a b c d x1 x2 x3"),   // 4-token overlap with doc 2 < min 5
      (2L, "a b c d y1 y2 y3"),
      (3L, "s s s s s s s s s s"), // degenerate stop-gram doc
      (4L, "s s s s s s s s s s")
    ).toDF("doc_id", "text")
    // "s s s" occurs 8x/doc = 16 > maxBucket 8 -> bucket dropped, no span
    val got = Dedup.repeatedSpans(spans, "doc_id", "text",
        k = 3, minSpanTokens = 5, maxBucket = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.isEmpty, got.mkString(","))
    // raising the cap surfaces the degenerate pair's maximal span
    val capped = Dedup.repeatedSpans(spans, "doc_id", "text",
        k = 3, minSpanTokens = 5, maxBucket = 64)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(capped.nonEmpty && capped.forall(r => r._1 == 3L && r._2 == 4L))
  }

  test("jaccardPrefixJoin is COMPLETE: equals brute-force all-pairs at the threshold") {
    // pseudo-random token sets over a small vocab so many pairs land on
    // both sides of the threshold
    val docs = (1L to 60L).map { i =>
      val toks = (0 until 12).map(j => s"w${(i * 31 + j * 17) % 40}").distinct
      (i, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixJoin(df, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val sets = docs.map { case (i, t) => i -> t.split(" ").toSet }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if jac >= 0.5
    } yield (a, b)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("jaccardPrefixJoin: exact duplicates score 1.0; disjoint sets never pair") {
    val df = Seq((1L, "p q r s"), (2L, "p q r s"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixJoin(df, "doc_id", "text", threshold = 0.9)
      .select("a_id", "b_id", "jac").as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("set joins: empty and all-null corpora return empty, not crash") {
    // regression: the eager vocab probe (max over an empty grouped
    // frame) returned NULL and .getLong threw ROW_VALUE_IS_NULL
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val nulls = Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text")
    for (df <- Seq(empty, nulls)) {
      assert(Dedup.jaccardPrefixJoin(df, "doc_id", "text", 0.5).count() == 0)
      assert(Dedup.containmentJoin(df, "doc_id", "text", 0.5).count() == 0)
      val cols = Dedup.jaccardPrefixJoin(df, "doc_id", "text", 0.5).columns.toSeq
      assert(cols == Seq("a_id", "b_id", "inter", "jac"))
    }
  }

  test("containmentJoin is COMPLETE and directed: equals all-ordered-pairs truth") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val cdocs = Seq(
      (1L, base),                                       // the excerpt
      (2L, base + " iota kappa lambda mu nu xi"),       // superset page
      (3L, base),                                       // exact dup of 1
      (4L, "one two three four five six seven eight"),  // unrelated
      (5L, "pre " + base + " post")                     // superset, both ends
    ).toDF("doc_id", "text")
    def bigrams(s: String) =
      s.split("\\s+").toSeq.sliding(2).map(_.mkString(" ")).toSet
    val sets = Seq(1L -> base, 2L -> (base + " iota kappa lambda mu nu xi"),
      3L -> base, 4L -> "one two three four five six seven eight",
      5L -> ("pre " + base + " post")).map { case (i, t) => i -> bigrams(t) }.toMap
    val t = 0.8
    val want = (for {
      a <- sets.keys; b <- sets.keys if a != b
      inter = (sets(a) & sets(b)).size
      if inter.toDouble / sets(a).size >= t
    } yield (a, b, inter.toLong, inter.toDouble / sets(a).size)).toSet
    val got = Dedup.containmentJoin(cdocs, "doc_id", "text", t)
      .select("a_id", "b_id", "inter", "cont")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // direction matters: the excerpt is contained in the superset page,
    // never the reverse
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._4 == 1.0))
    assert(!got.exists(p => p._1 == 2L && p._2 == 1L))
  }

  test("containmentJoin on pseudo-random sets equals brute force (mixed sizes)") {
    val docs = (1L to 50L).map { i =>
      val n = 6 + (i % 9).toInt
      val toks = (0 until n).map(j => s"w${(i * 13 + j * 7) % 23}")
      (i, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    def bigrams(s: String) =
      s.split("\\s+").toSeq.sliding(2).map(_.mkString(" ")).toSet
    val sets = docs.map { case (i, t) => i -> bigrams(t) }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a != b
      inter = (sets(a) & sets(b)).size
      if inter.toDouble / sets(a).size >= 0.6
    } yield (a, b)).toSet
    val got = Dedup.containmentJoin(df, "doc_id", "text", threshold = 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("pairEval: canonicalization, duplicates collapsed, exact metrics") {
    import spark.implicits._
    // pred has a reversed duplicate of (1,2) and one false positive
    val pred = Seq((1L, 2L), (2L, 1L), (3L, 4L), (5L, 6L)).toDF("a_id", "b_id")
    val truth = Seq((1L, 2L), (3L, 4L), (7L, 8L)).toDF("a_id", "b_id")
    val m = Dedup.pairEval(pred, truth).collect().head
    assert(m.getAs[Long]("n_pred") == 3L)
    assert(m.getAs[Long]("n_truth") == 3L)
    assert(m.getAs[Long]("n_tp") == 2L)
    assert(m.getAs[Double]("precision") == 2.0 / 3.0)
    assert(m.getAs[Double]("recall") == 2.0 / 3.0)
    assert(math.abs(m.getAs[Double]("f1") - 2.0 / 3.0) < 1e-15)
  }

  test("pairEval: empty prediction side yields null precision, zero tp") {
    import spark.implicits._
    val pred = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val truth = Seq((1L, 2L)).toDF("a_id", "b_id")
    val m = Dedup.pairEval(pred, truth).collect().head
    assert(m.getAs[Long]("n_pred") == 0L && m.getAs[Long]("n_tp") == 0L)
    assert(m.isNullAt(m.fieldIndex("precision")))
    assert(m.getAs[Double]("recall") == 0.0)
  }

  test("lshPlan picks the step-minimizing banding; validates the defaults") {
    // the hard-coded minHashLsh default (32 hashes, 8 bands) is the
    // planner's own choice at the 0.5 estimate threshold
    assert(Dedup.lshPlan(32, 0.5) == ((8, 4)))
    // higher threshold -> fewer bands / more rows (sharper, stricter)
    assert(Dedup.lshPlan(32, 0.8) == ((4, 8)))
    // lower threshold -> more bands / fewer rows (recall-preserving)
    assert(Dedup.lshPlan(32, 0.2) == ((16, 2)))
    assert(Dedup.lshPlan(16, 0.5) == ((4, 4)))
    assert(Dedup.lshPlan(128, 0.7) == ((16, 8)))
    // the winner's rule-of-thumb transition point (1/b)^(1/r) brackets
    // the requested threshold within the divisor grid's resolution
    val (b, r) = Dedup.lshPlan(64, 0.6)
    val t = math.pow(1.0 / b, 1.0 / r)
    assert(math.abs(t - 0.6) < 0.2, s"($b,$r) transition $t")
  }
}
