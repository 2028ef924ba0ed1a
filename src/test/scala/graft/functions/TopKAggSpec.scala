package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKBySim must reproduce the rank-window plan it replaces — including
  * NaN placement: a zero-norm vector's cosine is 0/0 = NaN, and both
  * Spark's and DuckDB's `ORDER BY sim DESC` rank NaN LARGEST, so the
  * bounded aggregator must too (java.lang.Double.compare ordering).
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val scored = Seq(
    (1L, 10L, 0.9), (1L, 11L, Double.NaN), (1L, 12L, 0.5), (1L, 13L, 0.9),
    (2L, 20L, 0.1), (2L, 21L, 0.3), (2L, 22L, 0.2), (2L, 23L, 0.3)
  ).toDF("qid", "nid", "sim")

  private def aggTopK(k: Int) = {
    val topk = udaf(new TopKBySim(k))
    scored.groupBy($"qid").agg(topk($"sim", $"nid").as("top"))
      .select($"qid", posexplode($"top").as(Seq("pos", "s")))
      .select($"qid", $"s.nid".as("nid"), $"s.sim".as("sim"),
        ($"pos" + 1).cast("long").as("rnk"))
  }

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w).cast("long")).where(col("rnk") <= k)
      .select("qid", "nid", "sim", "rnk")
  }

  test("equals the rank window incl. NaN-first placement and nid tie-breaks") {
    for (k <- Seq(1, 2, 3, 10)) {
      val a = aggTopK(k).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val w = windowTopK(k).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(a == w, s"k=$k: $a vs $w")
    }
    // NaN outranks every finite sim
    val top1 = aggTopK(1).where($"qid" === 1).select("nid").as[Long].head()
    assert(top1 == 11L)
  }

  test("zero-norm corpus vector flows through bruteForceTopK as rank 1") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .bruteForceTopK(vecs.where(col("vec_id") === 0), vecs, 2)
      .select("nid", "rnk").as[(Long, Long)].collect().toMap
    assert(got(2L) == 1L, s"NaN (zero vector) must rank first: $got")
    assert(got(1L) == 2L)
  }

  test("native TopKSimAgg equals the udaf form and the window (incl. NaN rows)") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    for (kk <- Seq(1, 2, 3, 10)) {
      val topk = ColumnBridge.column(graft.expressions.TopKSimAgg(
        ColumnBridge.expressionEager(col("sim")),
        ColumnBridge.expressionEager(col("nid")), kk).toAggregateExpression())
      val native = scored.groupBy($"qid").agg(topk.as("top"))
        .select($"qid", posexplode($"top").as(Seq("pos", "s")))
        .select($"qid", $"s.nid".as("nid"), ($"pos" + 1).cast("long").as("rnk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val viaUdaf = aggTopK(kk).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val viaWindow = windowTopK(kk).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(native == viaUdaf && native == viaWindow, s"k=$kk: $native")
    }
  }

  test("merge of partial buffers equals single-pass reduce") {
    // NaN != NaN under ==, so compare via raw bits
    def bits(s: Seq[Scored]) =
      s.map(x => (java.lang.Double.doubleToLongBits(x.sim), x.nid))
    val agg = new TopKBySim(3)
    val rows = Seq(Scored(0.4, 1), Scored(Double.NaN, 2), Scored(0.4, 0),
      Scored(0.9, 9), Scored(0.1, 5), Scored(0.9, 8))
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    for (split <- 0 to rows.length) {
      val (l, r) = rows.splitAt(split)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(bits(agg.finish(m)) == bits(agg.finish(whole)), s"split=$split")
    }
    // bounded: never more than k entries, ordered NaN-first then desc, nid asc
    assert(bits(agg.finish(whole)) ==
      bits(Seq(Scored(Double.NaN, 2), Scored(0.9, 8), Scored(0.9, 9))))
  }
}
