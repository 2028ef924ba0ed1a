package graft.plans

import graft.SparkSpec
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

/** PushFiltersThroughGraftJoins: the custom join nodes must not be
  * pushdown barriers — single-side deterministic conjuncts land below
  * the node (and reach the parquet scan as PushedFilters), unsound
  * pushes (as-of right side) stay put, and results are identical to
  * the unoptimized semantics.
  */
class PushFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def lDf = (0L until 200L)
    .map(i => (i % 10, i, i * 3, i * 3 + 20)).toDF("k", "lid", "s", "e")
  private def rDf = (0L until 150L)
    .map(i => (i % 12, 1000L + i, i * 4, i * 4 + 9)).toDF("k", "rid", "s", "e")

  test("interval join: both sides' single-side conjuncts push below the node") {
    // parquet-backed inputs: over a LocalRelation the pushed filters
    // immediately FOLD into the relation (ConvertToLocalRelation runs
    // after the injected push rule) and the structural probe below
    // would see nothing — which is the push working, not failing
    val dir = java.nio.file.Files.createTempDirectory("pushiv").toString
    lDf.write.mode("overwrite").parquet(s"$dir/l")
    rDf.write.mode("overwrite").parquet(s"$dir/r")
    val joined = RangeJoin.overlapJoinNative(
        spark.read.parquet(s"$dir/l"), spark.read.parquet(s"$dir/r"),
        "k", "lid", "s", "e", "k", "rid", "s", "e")
      .where(col("a_id") < 100 && col("b_id") >= 1050 && col("ov_len") > 1)
    val opt = joined.queryExecution.optimizedPlan
    val node = opt.collectFirst { case j: IntervalJoinNode => j }.get
    assert(node.left.collectFirst { case f: Filter => f }.nonEmpty,
      s"left conjunct not pushed:\n$opt")
    assert(node.right.collectFirst { case f: Filter => f }.nonEmpty,
      s"right conjunct not pushed:\n$opt")
    // the mixed-attr conjunct (ov_len derives from both sides) stays above
    assert(opt.collectFirst {
      case f @ Filter(_, _: IntervalJoinNode) => f }.nonEmpty,
      s"cross-side conjunct must stay above the join:\n$opt")
  }

  test("interval join: pushed plan returns the exact post-filter rows") {
    val base = RangeJoin.overlapJoinNative(lDf, rDf,
      "k", "lid", "s", "e", "k", "rid", "s", "e")
    val pushed = base.where(col("a_id") % 3 === 0 && col("b_id") % 2 === 0)
      .collect().map(_.toString).toSet
    val reference = base.collect()
      .filter(r => r.getLong(1) % 3 == 0 && r.getLong(2) % 2 == 0)
      .map(_.toString).toSet
    assert(pushed == reference)
  }

  test("as-of join: left conjunct pushes, right-value conjunct must NOT") {
    // parquet-backed for the same reason as above: a pushed conjunct
    // over a LocalRelation folds away and leaves nothing to probe
    val dir = java.nio.file.Files.createTempDirectory("pushasof").toString
    Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 15L, 300L))
      .toDF("k", "t", "qty").write.mode("overwrite").parquet(s"$dir/t")
    Seq((1L, 5L, 9.0), (1L, 18L, 11.0), (2L, 1L, 5.0))
      .toDF("k", "t", "px").write.mode("overwrite").parquet(s"$dir/q")
    val trades = spark.read.parquet(s"$dir/t")
    val quotes = spark.read.parquet(s"$dir/q")
    val joined = AsOfJoin.lookupLastNative(trades, quotes, "k", "t", "t",
        "px", "px")
      .where(col("qty") > 150 && col("px") > 10.0)
    val opt = joined.queryExecution.optimizedPlan
    val node = opt.collectFirst { case j: AsOfJoinNode => j }.get
    // qty (left) pushed below
    assert(node.left.collectFirst { case f: Filter => f }.nonEmpty,
      s"left conjunct not pushed:\n$opt")
    // px (matched-value attr) stays above — pre-filtering quotes would
    // re-match trades to older quotes and change the semantics
    val above = opt.collectFirst { case f @ Filter(_, _: AsOfJoinNode) => f }
    assert(above.nonEmpty, s"right-value conjunct must stay above:\n$opt")
    assert(above.get.condition.references.map(_.name).toSet == Set("px"))
    // and the result is the post-join filter semantics: trade(1,20)
    // matched quote(1,18,11.0) passes; qty<=150 rows gone
    val rows = joined.collect().map(_.toString).toSet
    assert(rows == Set("[1,20,200,11.0]"), rows.toString)
  }

  test("column pruning: a narrow select above the as-of join narrows the wide left scan") {
    val dir = java.nio.file.Files.createTempDirectory("prunec").toString
    // wide left: 6 columns, downstream query reads 2 (+ key/time)
    (0L until 100L).map(i => (i % 5, i, i * 2, i * 3, i * 4, s"pad$i"))
      .toDF("k", "t", "a", "b", "c", "pad")
      .write.mode("overwrite").parquet(s"$dir/l")
    (0L until 50L).map(i => (i % 5, i * 2, i.toDouble))
      .toDF("k", "t", "px").write.mode("overwrite").parquet(s"$dir/r")
    val l = spark.read.parquet(s"$dir/l")
    val r = spark.read.parquet(s"$dir/r")
    val joined = AsOfJoin.lookupLastNative(l, r, "k", "t", "t", "px", "px")
      .select("k", "a", "px")
    val phys = joined.queryExecution.executedPlan.toString
    // the wide columns never leave the left scan
    val leftScan = phys.linesIterator.find(s =>
      s.contains("FileScan") && s.contains("/l")).get
    assert(leftScan.contains("ReadSchema: struct<k:bigint,t:bigint,a:bigint>"),
      s"left scan not pruned:\n$leftScan")
    assert(joined.count() == 100)
  }

  test("column pruning: both interval-join sides narrow to referenced columns") {
    // direct node construction with WIDE children (the library wrapper
    // pre-narrows, so this is the path a raw plan-level user hits)
    val wideL = (0L until 60L)
      .map(i => (i % 4, i, i * 2, i * 2 + 9, s"x$i", i * 1.5))
      .toDF("k", "id", "s", "e", "junk", "w")
    val wideR = (0L until 40L)
      .map(i => (i % 4, 100L + i, i * 3, i * 3 + 7, s"y$i", i * 2.5))
      .toDF("k2", "id2", "s2", "e2", "junk2", "w2")
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.find(_.name == n).get
    val lp = wideL.queryExecution.analyzed
    val rp = wideR.queryExecution.analyzed
    val joined = org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(spark,
        IntervalJoinNode(lp, rp, attr(lp, "k"), attr(rp, "k2"),
          attr(lp, "s"), attr(lp, "e"), attr(rp, "s2"), attr(rp, "e2")))
      .select("id", "id2")
    val opt = joined.queryExecution.optimizedPlan
    val node = opt.collectFirst { case j: IntervalJoinNode => j }.get
    // junk/w gone from both child outputs before the exchange
    assert(!node.left.output.map(_.name).exists(Set("junk", "w")))
    assert(!node.right.output.map(_.name).exists(Set("junk2", "w2")))
    assert(joined.count() > 0)
  }

  test("pushed filters reach the parquet scan as PushedFilters") {
    val dir = java.nio.file.Files.createTempDirectory("pushf").toString
    lDf.write.mode("overwrite").parquet(s"$dir/l")
    rDf.write.mode("overwrite").parquet(s"$dir/r")
    val l = spark.read.parquet(s"$dir/l")
    val r = spark.read.parquet(s"$dir/r")
    val joined = RangeJoin.overlapJoinNative(l, r,
        "k", "lid", "s", "e", "k", "rid", "s", "e")
      .where(col("a_id") < 50)
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("LessThan(lid,50)") && phys.contains("IsNotNull(lid)"),
      s"scan-level pushdown missing:\n$phys")
    assert(joined.collect().forall(_.getLong(1) < 50))
  }
}
