package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stats.exactMedian must reproduce the built-in exact interpolated
  * percentile(0.5) — same values, different (partial-agg-friendly)
  * plan.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("matches built-in percentile(0.5) on real groups") {
    val li = graft.Tables.load(spark, sf(), "lineitem")
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val twoPass = Stats.exactMedian(li, "l_returnflag", "l_extendedprice")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(builtin.keySet == twoPass.keySet)
    for ((k, v) <- builtin)
      assert(math.abs(twoPass(k) - v) <= math.abs(v) * 1e-12, s"$k: ${twoPass(k)} vs $v")
  }

  test("q30 fidelity: built-in percentile(l_quantity, 0.5) equals the graded two-pass plan") {
    // q30's graded plan ships exactMedian (partial-agg two-pass); the
    // built-in single-buffer percentile() stays pinned equal here as the
    // fidelity variant — heavy-duplication integer-valued column, so the
    // straddling-rank interpolation path is exercised
    val li = graft.Tables.load(spark, sf(), "lineitem")
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val twoPass = Stats.exactMedian(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(builtin == twoPass)
  }

  test("odd / even group sizes and duplicated values interpolate correctly") {
    val df = Seq(
      ("odd", 3.0), ("odd", 1.0), ("odd", 2.0),
      ("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 10.0),
      ("dups", 5.0), ("dups", 5.0), ("dups", 5.0), ("dups", 7.0)
    ).toDF("k", "v")
    val m = Stats.exactMedian(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("odd") == 2.0)
    assert(m("even") == 2.5)   // (2+3)/2
    assert(m("dups") == 5.0)   // straddling ranks both inside the dup run
  }

  test("null values are ignored like the built-in") {
    val df = Seq(("k", Some(1.0)), ("k", None), ("k", Some(3.0)))
      .toDF("k", "v")
    val m = Stats.exactMedian(df, "k", "v").collect().head.getDouble(1)
    assert(m == 2.0)
  }

  test("all-null group is absent (documented difference from the built-in)") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("b", None)).toDF("k", "v")
    val keys = Stats.exactMedian(df, "k", "v").collect().map(_.getString(0)).toSet
    assert(keys == Set("a"))
  }

  test("exactPercentiles matches the built-in percentile for several p at once") {
    val vals = Seq(4.0, 1.0, 7.0, 3.0, 9.0, 2.0, 8.0, 5.0, 6.0, 10.0)
    val df = vals.map(("k", _)).toDF("k", "v")
    val ps = Seq(0.0, 0.05, 0.25, 0.5, 0.9, 1.0)
    val got = Stats.exactPercentiles(df, "k", "v", ps)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val exp = df.selectExpr(
        ps.map(p => s"percentile(v, $p) as `p$p`"): _*)
      .collect().head
    ps.zipWithIndex.foreach { case (p, i) =>
      assert(math.abs(got(p) - exp.getDouble(i)) < 1e-12, s"p=$p")
    }
  }

  test("exactPercentiles: median agrees with exactMedian across keys") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0), ("b", 21.0)).toDF("k", "v")
    val viaP = Stats.exactPercentiles(df, "k", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val viaM = Stats.exactMedian(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaP == viaM)
  }

  test("madOutliers: injected spikes flag, clean uniform data does not") {
    // group a: tight cluster + two wild spikes; group b: clean ramp
    val rows = (1 to 20).map(i => ("a", 100.0 + i)) ++
      Seq(("a", 5000.0), ("a", -4000.0)) ++
      (1 to 20).map(i => ("b", 10.0 * i))
    val got = Stats.madOutliers(rows.toDF("k", "v"), "k", "v", cut = 3.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((22L, 2L)), got.toString)
    assert(got("b") == ((20L, 0L)), got.toString)
  }

  test("madOutliers: med/mad match the hand-computed robust stats") {
    // odd n: med = middle, mad = median absolute deviation
    val df = Seq(("k", 1.0), ("k", 2.0), ("k", 3.0), ("k", 4.0), ("k", 100.0))
      .toDF("k", "v")
    val r = Stats.madOutliers(df, "k", "v").collect().head
    assert(r.getDouble(3) == 3.0) // median
    assert(r.getDouble(4) == 1.0) // |1-3|,|2-3|,|3-3|,|4-3|,|97| -> med = 1
    assert(r.getLong(2) == 1L)    // only 100 is an outlier
  }

  test("psiDrift: identical samples give ~0, a shifted sample spikes the edge bins") {
    import spark.implicits._
    val base = (1 to 100).map(i => i.toDouble).toDF("v")
    val same = Stats.psiDrift(base, base, "v", bins = 10).collect()
    assert(same.length == 10)
    assert(same.map(_.getDouble(3)).map(math.abs).sum < 1e-12)
    // current shifted way past base max: everything clamps into bin 9
    val shifted = (1 to 100).map(i => i + 1000.0).toDF("v")
    val drift = Stats.psiDrift(base, shifted, "v", bins = 10).collect()
    val byBin = drift.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byBin(9L) == 100L, byBin.toString) // all current mass in the top bin
    assert(drift.map(_.getDouble(3)).sum > 1.0) // PSI >> 0.25 = major drift
    // counts survive: bins partition both samples
    assert(drift.map(_.getLong(1)).sum == 100L)
  }

  test("equalFreqBins: quartiles of 1..100 split 25/25/25/25") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("k", i.toDouble)).toDF("key", "v")
    val out = Stats.equalFreqBins(df, "key", "v", k = 4)
    val byBin = out.groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBin == Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L), byBin.toString)
    // boundary rule: a value equal to a cutpoint stays in the lower bin
    val cut1 = 25.75 // percentile(1..100, 0.25)
    val bins = out.collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(bins(25.0) == 0L && bins(26.0) == 1L)
    assert(bins(50.0) == 1L && bins(51.0) == 2L, s"cut1=$cut1 ${bins(50.0)}")
  }

  test("equalFreqBins: heavy ties merge bins deterministically") {
    import spark.implicits._
    // 90% of mass at one value: all three cuts coincide there
    val df = ((1 to 90).map(_ => ("k", 5.0)) ++
      (1 to 10).map(i => ("k", 100.0 + i))).toDF("key", "v")
    val out = Stats.equalFreqBins(df, "key", "v", k = 4).collect()
      .map(r => r.getDouble(1) -> r.getLong(2))
    assert(out.filter(_._1 == 5.0).forall(_._2 == 0L))   // ties: lowest bin
    assert(out.filter(_._1 > 100.0).forall(_._2 == 3L))  // above all 3 cuts
  }

  test("relQuantiles: estimate is a lower bound within 2^-subBits relative error") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val vals = Seq.fill(5000)(1L + math.abs(rng.nextLong()) % 10000000L)
    val df = vals.map(("k", _)).toDF("key", "v")
    val got = Stats.relQuantiles(df, "key", "v", Seq(0.5, 0.9, 0.99), subBits = 7)
      .collect().head
    val sorted = vals.sorted
    def exact(q: Double) = sorted((math.ceil(q * vals.size) - 1).toInt)
    for ((q, i) <- Seq(0.5 -> 2, 0.9 -> 3, 0.99 -> 4)) {
      val est = got.getLong(i)
      val ex = exact(q)
      assert(est <= ex, s"q=$q est=$est not a lower bound of $ex")
      assert(ex < est * (1 + 1.0 / 128) + 1, s"q=$q est=$est too far below $ex")
    }
    assert(got.getLong(1) == vals.size)
  }

  test("relQuantiles: values below 2^subBits are returned exactly") {
    import spark.implicits._
    val df = (1L to 100L).map(("k", _)).toDF("key", "v")
    val got = Stats.relQuantiles(df, "key", "v", Seq(0.5, 0.99), subBits = 7)
      .collect().head
    assert(got.getLong(2) == 50L)  // ceil(0.5*100)=50th value = 50
    assert(got.getLong(3) == 99L)
  }

  test("relQuantiles: bucket state is mergeable — split halves equal the whole") {
    import spark.implicits._
    // additivity of the bucket counts IS the merge property; verify by
    // the operator's own partitioning-invariance: 1 vs 8 partitions
    val rng = new scala.util.Random(9)
    val vals = Seq.fill(2000)(1L + math.abs(rng.nextLong()) % 999983L)
    val one = Stats.relQuantiles(
      vals.map(("k", _)).toDF("key", "v").repartition(1), "key", "v", Seq(0.9))
      .collect().head.toSeq
    val eight = Stats.relQuantiles(
      vals.map(("k", _)).toDF("key", "v").repartition(8), "key", "v", Seq(0.9))
      .collect().head.toSeq
    assert(one == eight)
  }

  test("relQuantilesFromCounts: summed half-corpus counts serve the whole-corpus answer") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(13)
    val vals = Seq.fill(3000)(1L + math.abs(rng.nextLong()) % 5000000L)
    val (h1, h2) = vals.splitAt(1500)
    def cnts(vs: Seq[Long]) = vs.map(("k", _)).toDF("key", "v")
      .select(col("key"), Stats.relBucket(col("v"), 7).as("b"))
      .groupBy("key", "b").agg(count(lit(1)).as("c"))
    val merged = cnts(h1).unionByName(cnts(h2))
      .groupBy("key", "b").agg(sum("c").as("c"))
    val fromMerged = Stats.relQuantilesFromCounts(
      merged, "key", "b", "c", Seq(0.5, 0.99)).collect().head.toSeq
    val oneShot = Stats.relQuantiles(
      vals.map(("k", _)).toDF("key", "v"), "key", "v", Seq(0.5, 0.99))
      .collect().head.toSeq
    assert(fromMerged == oneShot)
  }

  test("relRanks: rank probes bound the exact CDF within one bucket width") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val vals = Seq.fill(4000)(1L + math.abs(rng.nextLong()) % 3000000L)
    val probes = Seq(1000L, 50000L, 2000000L)
    val got = Stats.relRanks(vals.map(("k", _)).toDF("key", "v"),
      "key", "v", probes).collect().head
    assert(got.getLong(1) == vals.size)
    probes.zipWithIndex.foreach { case (p, i) =>
      val est = got.getLong(2 + i)
      val exactLe = vals.count(_ <= p).toLong
      // est counts rows at-or-below the probe's BUCKET: >= exact rank,
      // and within the bucket's width of it (relative error 2^-7)
      assert(est >= exactLe, s"probe $p: $est < $exactLe")
      val hi = vals.count(_ <= p + math.max(1L, p / 128) + 1).toLong
      assert(est <= hi, s"probe $p: $est > $hi")
    }
    // probe bucket arithmetic: Scala mirror equals the Column expr
    for (v <- Seq(1L, 127L, 128L, 1000000L, (1L << 40) + 12345L)) {
      val viaCol = Seq(v).toDF("v")
        .select(Stats.relBucket(col("v"), 7)).as[Long].head()
      assert(Stats.relBucketOf(v, 7) == viaCol, s"v=$v")
    }
  }

  test("relQuantiles: non-positive values are out of contract and dropped") {
    import spark.implicits._
    val df = Seq(("k", -5L), ("k", 0L), ("k", 3L), ("k", 7L)).toDF("key", "v")
    val got = Stats.relQuantiles(df, "key", "v", Seq(1.0)).collect().head
    assert(got.getLong(1) == 2L) // n counts only the positive rows
    assert(got.getLong(2) == 7L)
  }
}
