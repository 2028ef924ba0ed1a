package graft

import graft.queries.TimeSeriesQueries
import org.apache.spark.sql.functions._

/** Invariants of the quant/time-series pack (q107/q109/q113/q114) on
  * sf0.001, plus the scale-shape guard: every query pre-aggregates to
  * the O(days) daily series (or partitions by the high-cardinality
  * user key) before any window runs.
  */
class TimeSeriesSpec extends SparkSpec {

  private def run(name: String) =
    TimeSeriesQueries.queries(name)(spark, sf())

  test("q107: RSI stays in [0,100], bands bracket the SMA, leading nulls only") {
    val rows = run("q107_tech_indicators")
      .select(col("rsi14"), col("boll_up"), col("sma20"), col("boll_dn"))
      .collect()
    val rsis = rows.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(rsis.nonEmpty && rsis.forall(v => v >= 0.0 && v <= 100.0))
    rows.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getDouble(1) >= r.getDouble(2) && r.getDouble(2) >= r.getDouble(3))
    }
  }

  test("q109: z-score flags a planted spike and nothing in a flat stream") {
    import spark.implicits._
    // flat stream + one spike at the end; window excludes current row
    val ev = ((1 to 40).map(i => (i.toLong, 7L, 10.0 + (i % 3) * 0.1)) :+
      (41L, 7L, 500.0)).toDF("event_id", "user_id", "value")
    ev.createOrReplaceTempView("_ts_events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id").rowsBetween(-30, -1)
    val out = ev
      .withColumn("mu", graft.functions.NumFns.stableRound(avg(col("value")).over(w), 6))
      .withColumn("sd", graft.functions.NumFns.stableRound(stddev_samp(col("value")).over(w), 6))
      .withColumn("z", when(col("sd").isNull || col("sd") === 0.0, lit(null))
        .otherwise((col("value") - col("mu")) / col("sd")))
      .where(abs(col("z")) > 3.0)
      .select(col("event_id")).as[Long].collect()
    assert(out.toSeq == Seq(41L), s"flagged: ${out.toSeq}")
  }

  test("q113: five contiguous non-overlapping folds cover every scored day") {
    val folds = run("q113_walk_forward")
      .select(col("fold"), col("n_days"), col("from_d"), col("to_d"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDate(2), r.getDate(3)))
      .sortBy(_._1)
    assert(folds.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    folds.sliding(2).foreach { case Array(a, b) =>
      assert(a._4.before(b._3), s"folds overlap: $a $b")
    }
    val total = run("q107_tech_indicators").count() - 1 // lag-1 drops day 1
    assert(folds.map(_._2).sum == total)
  }

  test("q114: peak is monotone, drawdown non-positive and 0 at each new peak") {
    val rows = run("q114_drawdown_vwap")
      .orderBy(col("d"))
      .select(col("vwap"), col("peak"), col("drawdown"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    rows.sliding(2).foreach { case Array(a, b) => assert(b._2 >= a._2) }
    rows.foreach { case (vwap, peak, dd) =>
      assert(dd <= 0.0)
      if (vwap == peak) assert(dd == 0.0)
    }
  }

  test("q115: rolling correlation stays in [-1,1] after warmup") {
    val vals = run("q115_rolling_corr").select(col("corr30"))
      .collect().flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(vals.nonEmpty && vals.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
  }

  test("q116: trend is null exactly at the 3-row series edges; identity holds") {
    val rows = run("q116_seasonal_decomp").orderBy(col("d")).collect()
    val n = rows.length
    rows.zipWithIndex.foreach { case (r, i) =>
      val edge = i < 3 || i >= n - 3
      assert(r.isNullAt(2) == edge, s"row $i trend-null=${r.isNullAt(2)}")
      if (!r.isNullAt(2) && !r.isNullAt(4)) {
        val (close, trend, seasonal, resid) =
          (r.getDouble(1), r.getDouble(2), r.getDouble(4), r.getDouble(5))
        assert(math.abs(close - trend - seasonal - resid) < 1e-9)
      }
    }
  }

  test("q117: ACF bounded, Ljung-Box Q positive and non-decreasing in k") {
    val rows = run("q117_acf_ljung_box").orderBy(col("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    rows.foreach { case (_, acf, q) =>
      assert(acf >= -1.0 && acf <= 1.0)
      assert(q >= 0.0)
    }
    rows.sliding(2).foreach { case Array(a, b) => assert(b._3 >= a._3) }
  }

  test("daily aggregate partial-combines before the exchange (scale shape)") {
    val plan = run("q107_tech_indicators").queryExecution.executedPlan.toString
    // partial agg -> shuffle -> final agg: the map-side combine that
    // makes the O(days) window input cheap at 100 TB
    assert(plan.contains("HashAggregate"), plan)
    val firstExchange = plan.indexOf("Exchange")
    val lastAgg = plan.lastIndexOf("HashAggregate")
    assert(firstExchange >= 0 && lastAgg > firstExchange,
      "expected partial aggregation below the shuffle")
  }
}
