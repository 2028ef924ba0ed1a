package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("qualityMetrics computes repetition stats and drops degenerate rows") {
    val docs = Seq(
      (1L, "aa bb cc dd"),                 // all distinct: top 1/4, dup 0
      (2L, "x x x x x x x x y y"),         // repeated: top 8/10, dup bigrams
      (3L, "one"),                         // single token -> dropped
      (4L, null.asInstanceOf[String])      // null -> dropped
    ).toDF("doc_id", "text")
    val got = Curation.qualityMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((4L, 0.25, 0.0, 2.0)))
    // doc 2: 10 words, top=8; 9 bigrams, distinct {x x, x y, y y} = 3
    val (n, topF, dupF, mwl) = got(2L)
    assert(n == 10L && topF == 0.8 && mwl == 1.0)
    assert(math.abs(dupF - (1.0 - 3.0 / 9.0)) < 1e-15)
  }

  test("keepRule gates on all three thresholds") {
    val docs = Seq(
      (1L, Seq.fill(40)("w").zipWithIndex.map { case (_, i) => s"w$i" }.mkString(" ")),
      (2L, Seq.fill(40)("same").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Curation.qualityMetrics(docs, "doc_id", "text")
      .where(Curation.keepRule(30L, 0.11, 0.05))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L)) // doc 2: top_unigram_frac = 1.0, dup = 1.0
  }

  test("contamination counts distinct n-gram overlap vs the bench slice") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),          // bench: grams ab, bg, gd
      (1L, "alpha beta gamma zeta"),           // hits ab, bg -> 2/3
      (2L, "zeta eta theta iota"),             // no hits -> absent
      (3L, "alpha beta alpha beta gamma")      // distinct grams: ab, ba, bg -> hits 2/3
    ).toDF("doc_id", "text")
    val got = Curation.contamination(docs, "doc_id", "text",
        isBench = col("doc_id") === 0, n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(3L) == ((3L, 2L, 2.0 / 3.0)))
  }

  test("packSequences assigns overflow bins per shard without splitting docs") {
    val docs = Seq(
      (1L, "a", "w w w w"),        // 4 tokens, prev 0  -> bin 0
      (2L, "a", "w w w w"),        // prev 4            -> bin 0
      (3L, "a", "w w w w"),        // prev 8 (overflow) -> bin 0
      (4L, "a", "w w w w"),        // prev 12           -> bin 1
      (5L, "b", "w w"),            // other shard restarts at 0
      (6L, "b", null.asInstanceOf[String])
    ).toDF("doc_id", "lang", "text")
    val got = Curation.packSequences(docs, "doc_id", "text", "lang", capacity = 10L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> (("a", 4L, 0L)), 2L -> (("a", 4L, 0L)),
      3L -> (("a", 4L, 0L)), 4L -> (("a", 4L, 1L)),
      5L -> (("b", 2L, 0L))))
  }

  test("domainCurate: blocklisted hosts drop, caps are exact, joins broadcast") {
    val docs = (0L until 40L).map { i =>
      (i, s"https://d${i % 4}.example.org/p/$i")
    }.toDF("doc_id", "url")
    val block = Seq("d1.example.org").toDF("host")
    val out = Curation.domainCurate(docs, "url", "doc_id", block, maxPerDomain = 3)
    val rows = out.select("host", "doc_id").as[(String, Long)].collect()
    val byHost = rows.groupBy(_._1)
    // d1 gone; survivors capped at exactly 3 of their 10 members
    assert(!byHost.contains("d1.example.org"))
    assert(byHost.keySet == Set("d0.example.org", "d2.example.org", "d3.example.org"))
    assert(byHost.values.forall(_.length == 3), byHost.view.mapValues(_.length).toMap.toString)
    // host extraction really is the URL authority
    assert(rows.forall { case (h, id) => h == s"d${id % 4}.example.org" })
    // blocklist applied via broadcast anti-join, not a literal filter
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join in:\n$plan")
    // determinism: same cap -> same sample
    val again = Curation.domainCurate(docs, "url", "doc_id", block, maxPerDomain = 3)
      .select("host", "doc_id").as[(String, Long)].collect()
    assert(again.sorted.sameElements(rows.sorted))
  }

  test("contamination broadcasts the bench side (no corpus-corpus shuffle join)") {
    val docs = (0L to 200L).map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7}"))
      .toDF("doc_id", "text")
    val df = Curation.contamination(docs, "doc_id", "text",
      isBench = col("doc_id") < 3, n = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
