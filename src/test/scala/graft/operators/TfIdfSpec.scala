package graft.operators

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark join"),            // high tf, short
    (2L, "spark table table table table table table table"), // tf=1, long
    (3L, "join join scan"),
    (4L, "scan scan scan scan"),               // no query terms
    (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private lazy val scores =
    TfIdf.bm25(docs, "doc_id", "text", Seq("spark", "join"), topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  test("only docs matching a term are returned; null text is unsearchable") {
    assert(scores.keySet == Set(1L, 2L, 3L))
  }

  test("higher tf beats lower tf at comparable length") {
    // doc 1: tf(spark)=3 in 4 tokens; doc 2: tf(spark)=1 in 8 tokens
    assert(scores(1L)._1 > scores(2L)._1)
  }

  test("matching both terms counts both (n_terms)") {
    assert(scores(1L)._2 == 2L) // spark + join
    assert(scores(2L)._2 == 1L)
    assert(scores(3L)._2 == 1L)
  }

  test("scores are positive and bounded by sum of idf*(k1+1)") {
    scores.values.foreach { case (s, _) => assert(s > 0.0) }
  }

  test("term-frequency stage shuffles nothing; df and stats join by broadcast") {
    val plan = TfIdf.bm25(docs, "doc_id", "text", Seq("spark"), topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    // the only Exchanges allowed: the tiny df aggregate, the 1-row
    // stats aggregate, the per-doc score aggregate, and the final
    // TakeOrdered — never a corpus-wide join shuffle
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("pmiPairs: presence (not tf) counts, hand-checked pmi, min-count cut") {
    val corpus = Seq(
      (1L, "a a b"), // repeated token counts once (presence)
      (2L, "a b"), (3L, "a b"), (4L, "a c"), (5L, "b c"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TfIdf.pmiPairs(corpus, "doc_id", "text",
        vocabSize = 10, minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (a,b) co-occurs >= 2 times: docs 1,2,3; df a=4, b=4, N=5
    assert(out.keySet == Set(("a", "b")), out.toString)
    val (cab, ca, cb, pmi) = out(("a", "b"))
    assert((cab, ca, cb) == ((3L, 4L, 4L)))
    // scores are stableRound'ed at scale 6 — compare at that precision
    assert(math.abs(pmi - math.log(3.0 * 5 / (4.0 * 4))) < 1e-6)
  }

  test("pmiPairs: vocabulary cut excludes rare terms from pairing") {
    val corpus = Seq(
      (1L, "x y rare1"), (2L, "x y rare2"), (3L, "x y"), (4L, "x y")
    ).toDF("doc_id", "text")
    // vocabSize=2 keeps x,y only; rare terms can never form pairs
    val out = TfIdf.pmiPairs(corpus, "doc_id", "text",
        vocabSize = 2, minPairCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSet == Set(("x", "y")))
  }

  test("bpePairCounts: frequency-weighted adjacent pairs, hand-checked") {
    val corpus = Seq(
      (1L, "abc ab"), (2L, "abc x")  // freq: abc=2, ab=1, x=1 (dropped: len<2)
    ).toDF("doc_id", "text")
    val out = TfIdf.bpePairCounts(corpus, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abc"×2 -> ab,bc each +2; "ab"×1 -> ab +1; "x" has no pairs
    assert(out == Map("ab" -> 3L, "bc" -> 2L))
  }

  test("bpePairCounts: top-k cut is deterministic on (n desc, pair)") {
    val corpus = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    val out = TfIdf.bpePairCounts(corpus, "text", topK = 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("aa", "bb")) // all n=1, lexical tie-break
  }

  test("queryLikelihood: only candidate docs score; more matches rank higher") {
    val got = TfIdf.queryLikelihood(docs, "doc_id", "text",
        Seq("spark", "join"), mu = 10.0, topK = 10)
      .collect().map(_.getLong(0)).toSeq
    // doc 4 (no query term) and doc 5 (null) are absent
    assert(!got.contains(4L) && got.length == 3)
    // doc 1 has both terms with high tf on a short doc -> top
    assert(got.head == 1L)
  }

  test("rrfFuse: hand-checked reciprocal-rank sum across two lists") {
    val l1 = Seq((10L, 5.0), (20L, 4.0), (30L, 3.0)).toDF("doc_id", "score")
    val l2 = Seq((20L, 9.0), (40L, 8.0)).toDF("doc_id", "score")
    val got = TfIdf.rrfFuse(Seq(l1, l2), k = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // 20 is rank 2 in l1 and rank 1 in l2 -> 1/62 + 1/61, two lists
    val exp20 = 1.0 / 62 + 1.0 / 61
    assert(got.head._1 == 20L && got.head._3 == 2L)
    assert(math.abs(got.head._2 - exp20) < 1e-12)
    // singles: 10 -> 1/61, 30 -> 1/63, 40 -> 1/62
    val m = got.map(t => t._1 -> t._2).toMap
    assert(math.abs(m(10L) - 1.0 / 61) < 1e-12)
    assert(math.abs(m(40L) - 1.0 / 62) < 1e-12)
    assert(math.abs(m(30L) - 1.0 / 63) < 1e-12)
  }

  test("skipGramPairs: directed ±window pairs, edge tokens clipped, minCount gates") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = TfIdf.skipGramPairs(docs, "text", window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a sees b,c; b sees a,c,d; c sees a,b,d; d sees b,c — all count 1
    val expected = Seq("a" -> "b", "a" -> "c", "b" -> "a", "b" -> "c",
      "b" -> "d", "c" -> "a", "c" -> "b", "c" -> "d", "d" -> "b", "d" -> "c")
    assert(got == expected.map(_ -> 1L).toMap)
    // directed counting: "x y x" gives (x,y) twice but (y,x) twice too
    val rep = TfIdf.skipGramPairs(Seq((1L, "x y x")).toDF("doc_id", "text"),
        "text", window = 1, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep == Map(("x", "y") -> 2L, ("y", "x") -> 2L))
  }

  test("oovRate: top-K vocab by (count desc, token), exact per-doc rates") {
    import spark.implicits._
    // counts: a=4, b=3, c=2, d=1 -> vocab(2) = {a, b}
    val docs = Seq((1L, "a a b c"), (2L, "a a b b c d")).toDF("doc_id", "text")
    val out = TfIdf.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate")))).toMap
    assert(out(1L) == ((4L, 1L, 0.25)))
    assert(out(2L) == ((6L, 2L, 2.0 / 6.0)))
  }

  test("oovRate: count ties at the vocab boundary break by token order") {
    import spark.implicits._
    // b and c both have count 2; vocab(2) = {a, b} (b < c)
    val docs = Seq((1L, "a a a b b c c")).toDF("doc_id", "text")
    val out = TfIdf.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .collect().head
    assert(out.getAs[Long]("n_oov") == 2L) // the two c's
  }
}
