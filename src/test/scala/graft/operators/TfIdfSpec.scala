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
}
