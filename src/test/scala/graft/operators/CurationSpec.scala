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

  test("chunk: stride windows cover every token; short docs yield one chunk") {
    val docs = Seq(
      (1L, (1 to 25).map(i => s"t$i").mkString(" ")), // 25 toks: chunks at 0, 10 (short tail at 20)
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Curation.chunk(docs, "doc_id", "text", chunkTokens = 10, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_._4).toSeq == Seq(10L, 10L, 5L))
    assert(d1.head._3.startsWith("t1 ") && d1.last._3 == "t21 t22 t23 t24 t25")
    // every token appears exactly once at stride == chunkTokens
    assert(d1.flatMap(_._3.split(" ")).length == 25)
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b c", 3L)))
    assert(!got.exists(_._1 == 3L))
    // overlap: stride < chunk duplicates the boundary tokens
    val ov = Curation.chunk(docs.where(col("doc_id") === 1L), "doc_id", "text",
      chunkTokens = 10, stride = 5)
    assert(ov.count() == 4) // starts 0, 5, 10, 15 -> 1 + ceil(15/5) = 4
  }

  test("mergeIntervals: overlapping and adjacent-overlap runs collapse per key") {
    val ivs = Seq(
      ("a", 0L, 5L), ("a", 3L, 8L), ("a", 8L, 9L),  // 8 touches [3,8) end: separate island ([s,e) half-open, s > pmax fails -> merged)
      ("a", 20L, 25L),
      ("b", 0L, 2L), ("b", 0L, 2L)                   // exact duplicates
    ).toDF("k", "s", "e")
    val got = Curation.mergeIntervals(ivs, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 0L, 9L), ("a", 20L, 25L), ("b", 0L, 2L)), got.toString)
  }

  test("removeRepeatedSpans drops only covered positions of the b side") {
    val docs = Seq(
      (1L, "keep1 keep2 dup1 dup2 dup3 keep3"),
      (2L, "dup1 dup2 dup3 mine1 mine2")
    ).toDF("doc_id", "text")
    val spans = Seq((1L, 2L, 2L, 0L, 3L))
      .toDF("a_doc", "b_doc", "a_start", "b_start", "span_toks")
    val got = Curation.removeRepeatedSpans(docs, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // a side intact, b side loses tokens [0, 3)
    assert(got(1L) == (("keep1 keep2 dup1 dup2 dup3 keep3", 0L)))
    assert(got(2L) == (("mine1 mine2", 3L)))
  }

  test("canonicalizeUrls collapses every perturbation axis to one key") {
    val variants = Seq(
      (1L, "HTTPS://WWW.X.Example.org:443/a/b/?b=2&utm_source=f&a=1#top"),
      (2L, "https://x.example.org/a/b?a=1&b=2"),
      (3L, "https://X.example.ORG:443/a/b/?utm_campaign=z&b=2&gclid=g&a=1"),
      (4L, "http://other.org/a")  // different scheme+host stays distinct
    ).toDF("doc_id", "url")
    val got = Curation.canonicalizeUrls(variants, "url")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(got(1L)._1 == "https://x.example.org/a/b?a=1&b=2")
    assert(got(1L)._1 == got(2L)._1 && got(2L)._1 == got(3L)._1)
    assert(got(1L)._2 == 3L && got(4L)._2 == 1L)
    assert(got(4L)._1 == "http://other.org/a")
  }

  test("canonicalizeUrls keeps non-tracking params and drops empty query") {
    val got = Curation.canonicalizeUrls(Seq(
        (1L, "https://h.org/p?utm_source=x"),
        (2L, "https://h.org/p?z=9&y=8")).toDF("doc_id", "url"), "url")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "https://h.org/p")      // all params were tracking
    assert(got(2L) == "https://h.org/p?y=8&z=9") // sorted survivors
  }

  test("blocklistFilter: multiplicity counts, fraction gate, zero-token drop") {
    val docs = Seq(
      (1L, "bad bad good"),     // 2/3 blocked -> dropped at 0.5
      (2L, "good fine bad ok"), // 1/4 -> kept at 0.5
      (3L, "clean words only"), // 0 blocked
      (4L, ""),                 // zero tokens -> unscoreable, dropped
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Curation.blocklistFilter(docs, "doc_id", "text",
        Seq("bad", "BAD"), maxFrac = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4))))
      .toMap
    assert(got == Map(
      1L -> ((3L, 2L, false)),
      2L -> ((4L, 1L, true)),
      3L -> ((3L, 0L, true))))
  }

  test("blocklistFilterJoin == blocklistFilter, and the term side broadcasts") {
    val docs = (0L to 100L)
      .map(i => (i, s"tok${i % 11} bad${i % 3} tok${(i * 7) % 11}"))
      .toDF("doc_id", "text")
    val terms = Seq("bad0", "bad1").toDF("term")
    val lit = Curation.blocklistFilter(docs, "doc_id", "text",
      Seq("bad0", "bad1"), maxFrac = 0.4)
    val join = Curation.blocklistFilterJoin(docs, "doc_id", "text",
      terms, "term", maxFrac = 0.4)
    assert(lit.collect().map(_.toSeq).toSet == join.collect().map(_.toSeq).toSet)
    val plan = join.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe in:\n$plan")
  }

  test("contamination broadcasts the bench side (no corpus-corpus shuffle join)") {
    val docs = (0L to 200L).map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7}"))
      .toDF("doc_id", "text")
    val df = Curation.contamination(docs, "doc_id", "text",
      isBench = col("doc_id") < 3, n = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("importance weights: target-domain features score high, weight is label-free") {
    val docs = Seq(
      (1L, "stock market rally", "en"),
      (2L, "stock market crash", "en"),
      (3L, "der markt ist gut", "de"),
      (4L, "stock market rally", "de") // target features, off-target label
    ).toDF("doc_id", "text", "lang")
    val w = Curation.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    assert(w(1L) > 0 && w(3L) < 0, s"expected en>0>de, got $w")
    // the weight depends only on the doc's features, not its own label
    assert(w(4L) == w(1L))
    // ratio table is vocabulary-sized and must broadcast
    val plan = Curation.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast ratios in:\n$plan")
  }

  test("char entropy: uniform = ln(k), single-class = 0, gate splits on threshold") {
    val docs = Seq((1L, "abcd"), (2L, "aaaaaaaa"), (3L, "abababab"))
      .toDF("doc_id", "text")
    val e = Curation.charEntropy(docs, "doc_id", "text", minEntropy = 1.0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("entropy"), r.getAs[Boolean]("keep")))).toMap
    assert(math.abs(e(1L)._1 - math.log(4.0)) < 1e-6 && e(1L)._2)
    assert(e(2L)._1 == 0.0 && !e(2L)._2)
    assert(math.abs(e(3L)._1 - math.log(2.0)) < 1e-6 && !e(3L)._2)
  }

  test("crossDocLineDedup: frequent segments removed, order preserved") {
    // segLen=2 segments; "x y" appears in docs 1,2,3 (>= 3) -> dropped;
    // "a b" appears in docs 1,2 only -> kept.
    val docs = Seq(
      (1L, "x y a b p q"),
      (2L, "m n x y a b"),
      (3L, "x y r s"),
      (4L, "t u v")).toDF("doc_id", "text")
    val out = Curation.crossDocLineDedup(docs, "doc_id", "text",
        segLen = 2, maxDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((3L, 1L, "a b p q")))
    assert(out(2L) == ((3L, 1L, "m n a b")))
    assert(out(3L) == ((2L, 1L, "r s")))
    assert(out(4L) == ((2L, 0L, "t u v"))) // odd tail segment "v" kept
  }

  test("curationLedger: first failing gate wins, canonicals come from survivors") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),   // clean, unique -> kept
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),   // exact copy of 1 -> exact_dup
      (3L, "w1 w2 w3 w4 w5 w6 w7 w9"),   // near-dup of 1 -> near_dup
      (4L, "x x x x x x x x"),            // one-word repetition -> quality
      (5L, null.asInstanceOf[String]),    // null text -> quality
      (6L, "p q r s t u v w")             // clean, unique -> kept
    ).toDF("doc_id", "text")
    val got = Curation.curationLedger(docs, "doc_id", "text",
        minWords = 5L, maxTopFrac = 0.5, maxDupFrac = 0.6,
        estThreshold = 0.2, jaccardThreshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getBoolean(3)))).toMap
    assert(got(1L) == (("kept", None, true)))
    assert(got(2L) == (("exact_dup", Some(1L), false)))
    assert(got(3L) == (("near_dup", Some(1L), false)))
    assert(got(4L) == (("quality", None, false)))
    assert(got(5L) == (("quality", None, false)))
    assert(got(6L) == (("kept", None, true)))
  }

  test("crossDocLineDedup: all-dropped doc reassembles to empty text") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = Curation.crossDocLineDedup(docs, "doc_id", "text",
        segLen = 2, maxDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    assert(out == Map(1L -> "", 2L -> "", 3L -> ""))
  }
}
