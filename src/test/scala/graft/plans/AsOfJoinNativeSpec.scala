package graft.plans

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan)
  * against the composed union+window form: identical rows on real and
  * adversarial data, and the physical plan the operator exists for —
  * a single merge exec over two sorted keyed children, no window, no
  * union.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("statistics: a small as-of result still broadcasts into a downstream join") {
    // the node reports output ≈ left (one row per left row) instead of
    // the default BinaryNode product-of-children — without the
    // override, |left|·|right| bytes mark this side unbroadcastable
    // and the downstream join degrades to SMJ
    val left = spark.range(200).selectExpr("id as k", "id as t")
    val right = spark.range(200).selectExpr("id % 50 as k", "id as rt", "id as v")
    val asof = AsOfJoin.lookupLastNative(left, right, "k", "t", "rt", "v", "out")
    val big = spark.range(100000).selectExpr("id as k", "id * 2 as payload")
    val joined = big.join(asof, Seq("k"))
    // static (pre-AQE) plan: the as-of side must be the broadcast build
    val p = joined.queryExecution.sparkPlan
    val bhj = p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"expected BroadcastHashJoin in:\n$p")
    // the as-of subtree must be the BUILD side of that join
    assert(bhj.exists { b =>
      val build = b.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
        case _ => b.left
      }
      build.exists(_.isInstanceOf[AsOfJoinExec])
    }, s"as-of side not the broadcast build side:\n$p")
    // and the logical estimate is left-sized, not product-sized
    val node = asof.queryExecution.optimizedPlan.collectFirst {
      case n: AsOfJoinNode => n }.get
    assert(node.stats.sizeInBytes <= node.left.stats.sizeInBytes * 3,
      s"stats not left-shaped: ${node.stats}")
  }

  test("statistics: interval-join output joins broadcast-side downstream") {
    val l = spark.range(300).selectExpr("id % 20 as k", "id as lid",
      "id as s", "id + 3 as e")
    val r = spark.range(300).selectExpr("id % 20 as k", "id as rid",
      "id as s", "id + 2 as e")
    val ij = graft.operators.RangeJoin.overlapJoinNative(l, r,
      "k", "lid", "s", "e", "k", "rid", "s", "e")
    val big = spark.range(100000).selectExpr("id as a_id", "id * 3 as payload")
    val p = big.join(ij, Seq("a_id")).queryExecution.sparkPlan
    val bhj = p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"expected BroadcastHashJoin in:\n$p")
  }

  test("native equals composed on the events corpus") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val composed = AsOfJoin.lookupLast(errors, purchases, "user_id",
      "ts", "p_ts", "p_ts", "last_purchase_ts")
    val native = AsOfJoin.lookupLastNative(errors, purchases, "user_id",
      "ts", "p_ts", "p_ts", "last_purchase_ts")
    assert(native.columns.toSeq == composed.columns.toSeq)
    assert(canon(native) == canon(composed))
  }

  test("tie semantics: equal-time rights resolve to the max value, inclusive <=") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (3L, 1L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 10L, 200.0), // tie at t=10: max wins
      (1L, 4L, 50.0),
      (2L, 7L, 7.5), (2L, 8L, 9.9),       // 8 > 7: excluded
      (9L, 1L, 1.0)                        // unmatched key
    ).toDF("k", "rt", "v")
    val native = AsOfJoin.lookupLastNative(left, right, "k", "t", "rt", "v", "out")
      .collect().map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    val composed = AsOfJoin.lookupLast(left, right, "k", "t", "rt", "v", "out")
      .collect().map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    val expected = Set((1L, "a", Some(200.0)), (1L, "b", Some(50.0)),
      (2L, "c", Some(7.5)), (3L, "d", None))
    assert(native == expected)
    assert(composed == expected)
  }

  test("many interleaved keys and repeated left times match a reference scan") {
    val rng = new scala.util.Random(11)
    val left = Seq.fill(400)((rng.nextInt(20).toLong, rng.nextInt(50).toLong))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("id", "k", "t")
    val right = Seq.fill(300)((rng.nextInt(25).toLong, rng.nextInt(50).toLong,
      rng.nextInt(1000).toLong)).toDF("k", "rt", "v")
    val native = AsOfJoin.lookupLastNative(left, right, "k", "t", "rt", "v", "out")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val rrows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lrows = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    lrows.foreach { case (id, k, t) =>
      val cands = rrows.filter(x => x._1 == k && x._2 <= t)
      val want = if (cands.isEmpty) None
        else Some(cands.maxBy(x => (x._2, x._3))._3)
      assert(native(id) == want, s"id=$id k=$k t=$t")
    }
  }

  test("forward native equals composed lookupNext on the events corpus") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
    val composed = AsOfJoin.lookupNext(views, purchases, "user_id",
      "ts", "p_ts", "value", "next_buy")
    val native = AsOfJoin.lookupNextNative(views, purchases, "user_id",
      "ts", "p_ts", "value", "next_buy")
    assert(canon(native) == canon(composed))
  }

  test("forward tie semantics: equal-time rights resolve to the min value, inclusive >=") {
    val left = Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 9.0), (1L, 10L, 3.0), (1L, 12L, 1.0),
      (2L, 4L, 8.0)).toDF("k", "rt", "v")
    val native = AsOfJoin.lookupNextNative(left, right, "k", "t", "rt", "v", "out")
      .collect().map(r => (r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(native == Set(("a", Some(3.0)), ("b", None)))
  }

  test("tolerance native equals composed lookupLastWithin on the events corpus") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val composed = AsOfJoin.lookupLastWithin(errors, purchases, "user_id",
      "ts", "p_ts", "p_ts", "recent", expr("INTERVAL 1 HOUR"))
    val native = AsOfJoin.lookupLastWithinNative(errors, purchases, "user_id",
      "ts", "p_ts", "p_ts", "recent", expr("INTERVAL 1 HOUR"))
    assert(canon(native) == canon(composed))
  }

  test("physical plan: one AsOfJoinExec over sorted keyed children; no window, no union") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "rt", "v")
    val df = AsOfJoin.lookupLastNative(left, right, "k", "t", "rt", "v", "out")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Union"), p)
    // both children keyed + sorted by EnsureRequirements
    assert("Sort ".r.findAllIn(p).size >= 2, p)
  }

  test("whole-stage boundary: both children fuse into codegen stages") {
    // the merge pass itself is the (intentional) codegen boundary —
    // its interpreted work is eliminated via codegen'd projections +
    // generated orderings — but the exchanges/sorts feeding it must
    // stay INSIDE WholeStageCodegen spans, or the whole pipeline
    // degrades to interpreted row processing
    // AQE off so the executed plan is inspectable statically (with it
    // on, the exec hides inside an AdaptiveSparkPlanExec until runtime)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val left = spark.range(100).selectExpr("id % 10 as k", "id as t")
      val right = spark.range(50).selectExpr("id % 10 as k", "id as rt",
        "cast(id as double) as v")
      val df = AsOfJoin.lookupLastNative(left, right, "k", "t", "rt", "v", "out")
      val asof = df.queryExecution.executedPlan.collect {
        case e: graft.plans.AsOfJoinExec => e }.head
      asof.children.foreach { child =>
        val hasCodegen = child.collectFirst {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
        assert(hasCodegen.nonEmpty,
          s"child subtree lost its WholeStageCodegen span:\n$child")
      }
      // and the result is still right (every left row produced once)
      assert(df.count() == 100)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
