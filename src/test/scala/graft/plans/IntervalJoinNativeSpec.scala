package graft.plans

import graft.SparkSpec
import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** The native interval-overlap join (custom LogicalPlan + Strategy +
  * plane-sweep SparkPlan) against the composed binned equi-join form:
  * identical rows on real and adversarial data, and the physical plan
  * the operator exists for — one sweep exec over two sorted keyed
  * children, no bin explode, no post-join distinct.
  */
class IntervalJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def q124Inputs() = {
    val a = graft.Tables.load(spark, sf(), "orders")
      .where(col("o_orderkey") % 47 === 0)
      .select(pmod(col("o_custkey"), lit(50)).as("ak"),
        col("o_orderkey").as("a_id"),
        datediff(to_date(col("o_orderdate")), lit("1990-01-01")).as("as0"))
      .withColumn("ae", col("as0") + 14)
    val b = graft.Tables.load(spark, sf(), "lineitem")
      .where(col("l_orderkey") % 61 === 0)
      .select(pmod(col("l_suppkey").cast("long"), lit(50)).as("bk"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("b_id"),
        datediff(to_date(col("l_shipdate")), lit("1990-01-01")).as("bs0"))
      .withColumn("be", col("bs0") + 7)
    (a, b)
  }

  test("native equals composed on the q124 supply-window corpus") {
    val (a, b) = q124Inputs()
    val composed = RangeJoin.overlapJoin(a, b,
      "ak", "a_id", "as0", "ae", "bk", "b_id", "bs0", "be", binWidth = 14L)
    val native = RangeJoin.overlapJoinNative(a, b,
      "ak", "a_id", "as0", "ae", "bk", "b_id", "bs0", "be")
    assert(native.columns.toSeq == composed.columns.toSeq)
    assert(canon(native) == canon(composed))
  }

  test("random interval soup matches a reference scan (dup starts, nesting, touching ends)") {
    val rng = new scala.util.Random(7)
    val lrows = Seq.fill(300)((rng.nextInt(8).toLong, rng.nextInt(40).toLong,
      1L + rng.nextInt(15))).zipWithIndex
      .map { case ((k, s, len), i) => (k, i.toLong, s, s + len) }
    val rrows = Seq.fill(250)((rng.nextInt(10).toLong, rng.nextInt(40).toLong,
      1L + rng.nextInt(25))).zipWithIndex
      .map { case ((k, s, len), i) => (k, 1000L + i, s, s + len) }
    val l = lrows.toDF("k", "id", "s", "e")
    val r = rrows.toDF("k", "id", "s", "e")
    val native = RangeJoin.overlapJoinNative(l, r,
        "k", "id", "s", "e", "k", "id", "s", "e")
      .collect().map(x => (x.getLong(1), x.getLong(2))).toSet
    val expected = (for {
      (lk, lid, ls, le) <- lrows
      (rk, rid, rs, re) <- rrows
      if lk == rk && math.max(ls, rs) < math.min(le, re)
    } yield (lid, rid)).toSet
    assert(native == expected)
  }

  test("null keys/bounds and improper intervals never match") {
    val l = Seq(
      (Some(1L), Some(0L), Some(10L), "ok"),
      (None, Some(0L), Some(10L), "null key"),
      (Some(1L), None, Some(10L), "null start"),
      (Some(1L), Some(5L), Some(5L), "empty"),
      (Some(1L), Some(9L), Some(3L), "inverted")
    ).toDF("k", "s", "e", "tag").withColumn("id", monotonically_increasing_id())
    val r = Seq(
      (Some(1L), Some(0L), Some(100L)),
      (None, Some(0L), Some(100L)),
      (Some(1L), None, Some(100L)),
      (Some(1L), Some(7L), Some(2L))
    ).toDF("k", "s", "e").withColumn("id", monotonically_increasing_id())
    val out = RangeJoin.overlapJoinNative(l, r,
      "k", "id", "s", "e", "k", "id", "s", "e").collect()
    // only the fully-proper, fully-non-null pair overlaps
    assert(out.length == 1)
    assert(out.head.getLong(3) == 0L && out.head.getLong(4) == 10L) // ov [0,10)
  }

  test("half-open semantics: touching intervals do not overlap") {
    val l = Seq((1L, 10L, 0L, 5L)).toDF("k", "id", "s", "e")
    val r = Seq((1L, 20L, 5L, 9L), (1L, 21L, 4L, 5L), (1L, 22L, 4L, 6L))
      .toDF("k", "id", "s", "e")
    val out = RangeJoin.overlapJoinNative(l, r,
        "k", "id", "s", "e", "k", "id", "s", "e")
      .select(col("b_id")).as[Long].collect().toSet
    assert(out == Set(21L, 22L)) // [5,9) touches, [4,5) and [4,6) overlap
  }

  test("long right intervals survive across many lefts; buffer prunes dead ones") {
    // one right spanning everything + rights that die early: every left
    // must see the spanning right, dead rights must not resurface
    val l = (0L until 50L).map(i => (1L, i, i * 10, i * 10 + 5)).toDF("k", "id", "s", "e")
    val r = Seq((1L, 900L, 0L, 1000L), (1L, 901L, 0L, 3L)).toDF("k", "id", "s", "e")
    val out = RangeJoin.overlapJoinNative(l, r,
        "k", "id", "s", "e", "k", "id", "s", "e")
      .groupBy(col("b_id")).count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out == Map(900L -> 50L, 901L -> 1L))
  }

  test("physical plan: one IntervalJoinExec over sorted keyed children; no explode, no distinct") {
    val (a, b) = q124Inputs()
    val df = RangeJoin.overlapJoinNative(a, b,
      "ak", "a_id", "as0", "ae", "bk", "b_id", "bs0", "be")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert("Sort ".r.findAllIn(p).size >= 2, p)
    // the composed form's post-join dedup is structurally absent: no
    // aggregate above the interval exec
    val execIdx = p.indexOf("IntervalJoin")
    assert(!p.take(execIdx).contains("HashAggregate"), p)
  }

  test("active-set guard: a pathological all-overlapping key fails loudly, not OOM") {
    // 200 rights under one key, all spanning [0, 10^6): the active set
    // must hold all of them at once — with the cap dialed below that,
    // the task fails with the named conf instead of buffering on
    spark.conf.set("spark.graft.intervalJoin.maxActive", "100")
    try {
      val l = Seq((1L, 0L, 1L, 999999L)).toDF("k", "id", "s", "e")
      val r = (0L until 200L).map(i => (1L, i, 0L, 1000000L))
        .toDF("k", "id", "s", "e")
      val ex = intercept[org.apache.spark.SparkException] {
        RangeJoin.overlapJoinNative(l, r,
          "k", "id", "s", "e", "k", "id", "s", "e").count()
      }
      val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).mkString
      assert(msg.contains("spark.graft.intervalJoin.maxActive"), msg)
      // the error is actionable without a re-run: it names the hot key
      // and the observed buffered/emitted counts
      assert(msg.contains("on key `1`"), msg)
      assert(msg.contains("live buffered rights"), msg)
      assert(msg.contains("already emitted for this key"), msg)
    } finally spark.conf.unset("spark.graft.intervalJoin.maxActive")
  }

  test("spill tier: a hot key past the in-memory threshold still joins correctly") {
    // 500 mutually-overlapping rights on one key with the in-memory
    // buffer dialed to 8 rows: the active set migrates into the
    // sorter-backed (spillable) tier and the join must emit the full
    // quadratic-degree output instead of erroring (the ceiling conf is
    // left at its default, far above 500) — the graceful tier between
    // "fits on heap" and the loud maxActive failure
    spark.conf.set("spark.graft.intervalJoin.inMemoryRows", "8")
    try {
      val l = (0L until 50L).map(i => (1L, i, i * 10L, 1000000L))
        .toDF("k", "id", "s", "e")
      val r = (0L until 500L).map(i => (1L, i, 0L, 1000000L))
        .toDF("k", "id", "s", "e")
      val got = RangeJoin.overlapJoinNative(l, r,
        "k", "id", "s", "e", "k", "id", "s", "e")
      assert(got.count() == 50L * 500L)
      // row content survives the spill round-trip, not just the count
      val one = got.where(col("a_id") === 7L).count()
      assert(one == 500L, s"left id=7 must match every right, got $one")
    } finally spark.conf.unset("spark.graft.intervalJoin.inMemoryRows")
  }

  test("lazy compaction: disjoint short intervals keep the buffer near the live set") {
    // 10k rights in consecutive disjoint [i, i+1) slots, lefts sweeping
    // across them: each left kills the previous right, so the live set
    // is O(1); the rebuild policy must keep the buffer bounded (dead
    // rows halved away) rather than accumulating all 10k
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val l = (0L until 10000L).map(i => (1L, i, i, i + 1L))
        .toDF("k", "id", "s", "e")
      val r = (0L until 10000L).map(i => (1L, i, i, i + 1L))
        .toDF("k", "id", "s", "e")
      val df = RangeJoin.overlapJoinNative(l, r,
        "k", "id", "s", "e", "k", "id", "s", "e")
      assert(df.count() == 10000L) // each left matches exactly its twin
      val exec = df.queryExecution.executedPlan.collectFirst {
        case e: IntervalJoinExec => e }.get
      val peak = exec.metrics("maxActiveRights").value
      assert(peak < 5000L, s"buffer accumulated dead rights: peak=$peak")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("whole-stage boundary: both children fuse into codegen stages") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val l = spark.range(100).selectExpr("id % 10 as k", "id as lid",
        "id as s", "id + 5 as e")
      val r = spark.range(80).selectExpr("id % 10 as k", "id as rid",
        "id as s", "id + 7 as e")
      val df = RangeJoin.overlapJoinNative(l, r,
        "k", "lid", "s", "e", "k", "rid", "s", "e")
      val exec = df.queryExecution.executedPlan.collect {
        case e: graft.plans.IntervalJoinExec => e }.head
      exec.children.foreach { child =>
        val hasCodegen = child.collectFirst {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
        assert(hasCodegen.nonEmpty,
          s"child subtree lost its WholeStageCodegen span:\n$child")
      }
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
