package graft.queries

import graft.Tables
import graft.functions.NumFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the daily price-like series — the
  * quant surface the reference's forecasting pipeline feeds (SURVEY.md
  * §7.6 extensions): technical indicators, anomaly flags, walk-forward
  * backtest evaluation, drawdown/VWAP. The reference stops at a SARIMAX
  * fit (`Serving_layer/app.py`); real users of a stock-forecasting
  * engine compute exactly these features next.
  *
  * Scale shape shared by the family: the raw corpus is first reduced by
  * a keyed daily aggregate (map-side combinable, one shuffle); every
  * window function then runs over the O(days) aggregated series — tiny
  * by construction — so the unpartitioned windows here are NOT the
  * whole-corpus single-partition trap (with per-ticker data the same
  * windows partition by ticker and parallelize).
  *
  * Cross-engine float policy: window-frame aggregates (AVG/STDDEV over
  * sliding frames) are order-dependent → stableRound/r15; everything
  * derived from the stabilized columns is pure per-row IEEE arithmetic
  * both engines replay bit-for-bit.
  */
object TimeSeriesQueries {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Daily "close" series from orders: r15'd avg price per order date.
    * One map-side-combinable shuffle; O(days) output.
    */
  private def dailyClose(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(NumFns.stableRound(avg(col("o_totalprice")), 4).as("close"))

  private val dailyCloseSql: String =
    s"""SELECT CAST(o_orderdate AS DATE) AS d,
        ${SqlFragments.r15("AVG(o_totalprice)", 4)} AS close
        FROM orders GROUP BY 1"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Technical indicators over the daily close: 20-day SMA + Bollinger
    // bands (±2σ), Cutler's RSI-14 (SMA gains/losses — the windowed
    // form; Wilder's EWMA variant is the EwAverage shape), and 20-day
    // volatility of simple returns. Gains/losses/returns are per-row
    // arithmetic over the stabilized close; each frame aggregate is
    // r15'd before any derived arithmetic, so bands and RSI are pure
    // functions of identical doubles on both engines.
    // Regular-grid resample + forward fill (operators/Resample): a
    // gappy per-key daily series (every 11th order only) normalizes
    // onto each key's own observed day range, gaps carrying the last
    // observation forward with provenance — the pandas/kdb ffill as a
    // distributed dataflow (per-key spine explode + one ordered
    // window). Oracle: generate_series spine + LAST_VALUE IGNORE
    // NULLS, value exact integer cents.
    // Holt linear-trend forecast per key — the one-pass smoothing
    // recurrence as a codegen'd array fold (no window, no iteration,
    // one agg row per key), h-step forecasts from the final
    // (level, trend). Dyadic constants (alpha=0.5, beta=0.25) make
    // the recurrence bit-identical in any IEEE engine, so the DuckDB
    // oracle replays it EXACTLY through a recursive CTE — a raw-double
    // hash match on a genuinely sequential computation.
    // Per-key OLS trend from exact integer sufficient statistics —
    // slope/intercept/R² of daily cents vs epoch-day, one hash agg
    // (no window, no regr_* order-dependent accumulation): every fit
    // value is a pure double function of exact BIGINTs, so the oracle
    // matches raw.
    "q259_ols_trend" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("x"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("user_id"), col("x"))
        .agg(sum(col("cents")).as("y"))
      graft.operators.Stats.olsPerKey(daily, "user_id", "x", "y")
    }),

    "q249_holt_forecast" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).cast("string").as("d"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("user_id"), col("d"))
        .agg(sum(col("cents")).as("y"))
      graft.operators.Smoothing.holtLinear(daily, "user_id", "d", "y",
        alpha = 0.5, beta = 0.25, horizon = 3)
    }),

    "q242_gapfill_ffill" -> ((s, dir) => {
      val src = t(s, dir, "orders").where(col("o_orderkey") % 11 === 0)
        .select(pmod(col("o_custkey"), lit(20)).as("key"),
          col("o_orderdate").as("od"),
          floor(col("o_totalprice") * 100).as("cents"))
      graft.operators.Resample.ffillDaily(src, "key", "od", "cents")
    }),

    "q107_tech_indicators" -> ((s, dir) => {
      val w1 = Window.orderBy("d")
      val w14 = Window.orderBy("d").rowsBetween(-13, 0)
      val w20 = Window.orderBy("d").rowsBetween(-19, 0)
      val staged = dailyClose(s, dir)
        .withColumn("prev", lag(col("close"), 1).over(w1))
        .withColumn("gain",
          when(col("prev").isNull, lit(null))
            .otherwise(greatest(col("close") - col("prev"), lit(0.0))))
        .withColumn("loss",
          when(col("prev").isNull, lit(null))
            .otherwise(greatest(col("prev") - col("close"), lit(0.0))))
        .withColumn("ret",
          when(col("prev").isNull, lit(null))
            .otherwise(col("close") / col("prev") - 1.0))
        .withColumn("sma20", NumFns.stableRound(avg(col("close")).over(w20), 2))
        .withColumn("sd20", NumFns.stableRound(stddev_samp(col("close")).over(w20), 2))
        .withColumn("avg_gain", NumFns.stableRound(avg(col("gain")).over(w14), 2))
        .withColumn("avg_loss", NumFns.stableRound(avg(col("loss")).over(w14), 2))
      staged.select(col("d"), col("close"), col("sma20"),
        (col("sma20") + lit(2.0) * col("sd20")).as("boll_up"),
        (col("sma20") - lit(2.0) * col("sd20")).as("boll_dn"),
        when(col("avg_loss") === 0.0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("avg_gain") / col("avg_loss")))
          .as("rsi14"),
        NumFns.stableRound(stddev_samp(col("ret")).over(w20), 8).as("vol20"))
    }),

    // Rolling z-score anomaly detection per user stream: mean/stddev of
    // the 30 PRECEDING values (current row excluded — the score must
    // not see itself), z = (value − μ)/σ from the stabilized moments,
    // flag |z| > 3. Partitioned by the high-cardinality user key, so
    // the windows parallelize across executors at scale.
    "q109_anomaly_zscore" -> ((s, dir) => {
      val w30 = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(-30, -1)
      t(s, dir, "events")
        .withColumn("mu", NumFns.stableRound(avg(col("value")).over(w30), 6))
        .withColumn("sd", NumFns.stableRound(stddev_samp(col("value")).over(w30), 6))
        .select(col("event_id"), col("user_id"), col("value"), col("mu"), col("sd"),
          when(col("sd").isNull || col("sd") === 0.0, lit(null))
            .otherwise((col("value") - col("mu")) / col("sd")).as("z"))
        .withColumn("is_anom", abs(col("z")) > 3.0)
    }),

    // Walk-forward backtest evaluation: dates split into 5 contiguous
    // folds (ntile over the day spine — expanding-window CV's test
    // periods), per-fold MAE/RMSE of the naive lag-1 forecast. The
    // error terms are exact per-row doubles; only the per-fold averages
    // are order-dependent (r15'd, then sqrt — IEEE-exact both engines).
    "q113_walk_forward" -> ((s, dir) => {
      val w1 = Window.orderBy("d")
      val staged = dailyClose(s, dir)
        .withColumn("prev", lag(col("close"), 1).over(w1))
        .withColumn("fold", ntile(5).over(w1))
        .where(col("prev").isNotNull)
        .withColumn("err", col("close") - col("prev"))
      staged.groupBy(col("fold"))
        .agg(count(lit(1)).as("n_days"),
          min(col("d")).as("from_d"), max(col("d")).as("to_d"),
          NumFns.stableRound(avg(abs(col("err"))), 4).as("mae"),
          sqrt(NumFns.stableRound(avg(col("err") * col("err")), 4)).as("rmse"))
    }),

    // 30-day rolling correlation between two daily series (orders
    // revenue vs lineitem volume) — the pairs-trading / lead-lag
    // signal. Two map-side-combined daily aggs, one equi-join on the
    // O(days) spine, CORR over the sliding frame (r15'd — the two
    // engines' moment formulations differ in low bits).
    "q115_rolling_corr" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(NumFns.stableRound(sum(col("o_totalprice")), 2).as("rev"))
      val vol = t(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(NumFns.stableRound(sum(col("l_quantity")), 2).as("vol"))
      val w30 = Window.orderBy("d").rowsBetween(-29, 0)
      rev.join(vol, Seq("d"))
        .select(col("d"), col("rev"), col("vol"),
          NumFns.stableRound(corr(col("rev"), col("vol")).over(w30), 6).as("corr30"))
    }),

    // Classical additive seasonal decomposition: centered 7-day MA
    // trend (null until the window is full — no half-window bias),
    // day-of-week seasonal means of the detrended series (epoch-day
    // mod 7 as the portable season index), residual = close − trend −
    // seasonal. The O(7) seasonal table broadcasts back.
    "q116_seasonal_decomp" -> ((s, dir) => {
      val w7 = Window.orderBy("d").rowsBetween(-3, 3)
      val staged = dailyClose(s, dir)
        .withColumn("dow", pmod(datediff(col("d"), lit("1970-01-01")), lit(7)))
        .withColumn("trend",
          when(count(col("close")).over(w7) === 7,
            NumFns.stableRound(avg(col("close")).over(w7), 4)))
        .withColumn("detr", col("close") - col("trend"))
      val seasonal = staged.where(col("detr").isNotNull)
        .groupBy(col("dow"))
        .agg(NumFns.stableRound(avg(col("detr")), 4).as("seasonal"))
      staged.join(broadcast(seasonal), Seq("dow"), "left")
        .select(col("d"), col("close"), col("trend"), col("dow").cast("long").as("dow"),
          col("seasonal"),
          (col("close") - col("trend") - col("seasonal")).as("resid"))
    }),

    // ACF at lags 1..7 of daily returns + the cumulative Ljung-Box Q —
    // the SARIMAX order-selection diagnostics the reference's serving
    // layer would run before fitting. One pass builds returns and
    // deviations, ONE aggregate row computes the denominator and all 7
    // lag numerators (no per-lag scans), then the 7-row result explodes
    // out of it. Every sum is r15'd; r_k and Q_k are pure arithmetic on
    // the stabilized values.
    "q117_acf_ljung_box" -> ((s, dir) => {
      val w1 = Window.orderBy("d")
      val lags = 1 to 7
      val rets = dailyClose(s, dir)
        .withColumn("prev", lag(col("close"), 1).over(w1))
        .where(col("prev").isNotNull)
        .withColumn("ret", col("close") / col("prev") - 1.0)
      val stats = rets.agg(
        count(lit(1)).cast("double").as("n"),
        NumFns.stableRound(avg(col("ret")), 12).as("mu"))
      val dev = rets.crossJoin(broadcast(stats))
        .withColumn("dev", col("ret") - col("mu"))
      val devLagged = lags.foldLeft(dev) { (df, k) =>
        df.withColumn(s"_l$k", lag(col("dev"), k).over(w1))
      }
      val aggCols =
        NumFns.stableRound(sum(col("dev") * col("dev")), 12).as("denom") +:
          lags.map(k =>
            NumFns.stableRound(sum(col("dev") * col(s"_l$k")), 12).as(s"_num$k"))
      val one = devLagged.groupBy(col("n")).agg(aggCols.head, aggCols.tail: _*)
      val wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
      one.select(col("n"), col("denom"),
          posexplode(array(lags.map(k => col(s"_num$k")): _*)).as(Seq("k0", "num")))
        .select((col("k0") + 1).cast("long").as("k"), col("n"),
          (col("num") / col("denom")).as("acf"))
        .withColumn("lb_q",
          col("n") * (col("n") + 2.0) *
            NumFns.stableRound(
              sum(col("acf") * col("acf") / (col("n") - col("k"))).over(wk), 14))
        .select(col("k"), col("acf"), col("lb_q"))
    }),

    // Max drawdown + VWAP: per-day volume-weighted average price from
    // lineitem (two r15'd sums, exact divide), running peak (MAX over
    // an unbounded frame — order-independent, no stabilization needed),
    // and the per-day drawdown off the peak as exact arithmetic.
    "q114_drawdown_vwap" -> ((s, dir) => {
      val wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(
          NumFns.stableRound(sum(col("l_extendedprice") * col("l_quantity")), 2).as("pv"),
          NumFns.stableRound(sum(col("l_quantity")), 2).as("vol"))
        .withColumn("vwap", col("pv") / col("vol"))
        .withColumn("peak", max(col("vwap")).over(wcum))
        .select(col("d"), col("vwap"), col("vol"), col("peak"),
          (col("vwap") / col("peak") - 1.0).as("drawdown"))
    })
  )

  /** The Holt recurrence replayed verbatim as a recursive CTE — shared
    * by q249 (batch fold) and q253 (streamed fold): level first, trend
    * from the NEW level, zero-trend init; dyadic constants make both
    * engines bit-identical.
    */
  private[queries] val HoltSql: String =
    """WITH RECURSIVE src AS (
         SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d,
                CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS yi
         FROM events GROUP BY user_id, d),
       s AS (SELECT user_id, CAST(yi AS DOUBLE) AS y,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS i
             FROM src),
       hw AS (
         SELECT user_id, i, y AS l, CAST(0.0 AS DOUBLE) AS b
         FROM s WHERE i = 1
         UNION ALL
         SELECT s.user_id, s.i,
                0.5*s.y + 0.5*(hw.l + hw.b),
                0.25*((0.5*s.y + 0.5*(hw.l + hw.b)) - hw.l) + 0.75*hw.b
         FROM hw JOIN s ON s.user_id = hw.user_id AND s.i = hw.i + 1),
       fin AS (
         SELECT user_id, i AS n, l AS level, b AS trend FROM hw
         QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY i DESC) = 1)
       SELECT f.user_id, f.n, f.level, f.trend, t.h,
              f.level + CAST(t.h AS DOUBLE) * f.trend AS yhat
       FROM fin f
       CROSS JOIN (SELECT CAST(range AS BIGINT) AS h FROM range(1, 4)) t"""

  val oracle: Map[String, String] = Map(

    // the recurrence replayed verbatim: level first, trend from the
    // NEW level, zero-trend init — literal-for-literal the operator's
    // update (dyadic constants make both engines bit-identical)
    "q249_holt_forecast" -> HoltSql,

    // same integer sufficient stats, same double formulas
    "q259_ols_trend" ->
      """WITH daily AS (
           SELECT user_id,
             CAST(datediff('day', DATE '1970-01-01',
               CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS x,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY user_id,
             CAST(CAST(ts AS TIMESTAMP) AS DATE)),
         a AS (SELECT user_id, COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
               FROM daily GROUP BY user_id),
         c AS (SELECT user_id, n,
                 n * sxy - sx * sy AS cxy,
                 n * sxx - sx * sx AS cxx,
                 n * syy - sy * sy AS cyy, sx, sy FROM a)
         SELECT user_id, n,
           CASE WHEN n >= 2 AND cxx <> 0
             THEN CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE) END AS slope,
           CASE WHEN n >= 2 AND cxx <> 0
             THEN (CAST(sy AS DOUBLE)
                   - CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE)
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END AS intercept,
           CASE WHEN n >= 2 AND cxx <> 0 AND cyy <> 0
             THEN CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE)
                  / (CAST(cxx AS DOUBLE) * CAST(cyy AS DOUBLE)) END AS r2
         FROM c""",

    "q242_gapfill_ffill" ->
      """WITH src AS (SELECT o_custkey % 20 AS key,
              CAST(o_orderdate AS DATE) AS d,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_orderkey % 11 = 0),
          obs AS (SELECT key, d, MAX(cents) AS v FROM src GROUP BY key, d),
          b AS (SELECT key, MIN(d) AS lo, MAX(d) AS hi FROM obs GROUP BY key),
          spine AS (SELECT key,
              CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                AS d FROM b),
          j AS (SELECT s.key, s.d, o.v FROM spine s
                LEFT JOIN obs o ON s.key = o.key AND s.d = o.d)
          SELECT key, d,
            LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
            v IS NULL AS filled
          FROM j""",

    "q107_tech_indicators" ->
      s"""WITH daily AS ($dailyCloseSql),
          staged AS (
            SELECT d, close,
              LAG(close, 1) OVER (ORDER BY d) AS prev
            FROM daily),
          feat AS (
            SELECT d, close,
              CASE WHEN prev IS NULL THEN NULL
                   ELSE GREATEST(close - prev, 0.0) END AS gain,
              CASE WHEN prev IS NULL THEN NULL
                   ELSE GREATEST(prev - close, 0.0) END AS loss,
              CASE WHEN prev IS NULL THEN NULL
                   ELSE close / prev - 1.0 END AS ret
            FROM staged),
          agg AS (
            SELECT d, close,
              ${SqlFragments.r15("AVG(close) OVER w20", 2)} AS sma20,
              ${SqlFragments.r15("STDDEV_SAMP(close) OVER w20", 2)} AS sd20,
              ${SqlFragments.r15("AVG(gain) OVER w14", 2)} AS avg_gain,
              ${SqlFragments.r15("AVG(loss) OVER w14", 2)} AS avg_loss,
              ${SqlFragments.r15("STDDEV_SAMP(ret) OVER w20", 8)} AS vol20
            FROM feat
            WINDOW
              w14 AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
              w20 AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
          SELECT d, close, sma20,
            sma20 + 2.0 * sd20 AS boll_up,
            sma20 - 2.0 * sd20 AS boll_dn,
            CASE WHEN avg_loss = 0.0 THEN 100.0
                 ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END AS rsi14,
            vol20
          FROM agg""",

    "q109_anomaly_zscore" ->
      s"""WITH staged AS (
            SELECT event_id, user_id, value,
              ${SqlFragments.r15("AVG(value) OVER w30", 6)} AS mu,
              ${SqlFragments.r15("STDDEV_SAMP(value) OVER w30", 6)} AS sd
            FROM events
            WINDOW w30 AS (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
          SELECT event_id, user_id, value, mu, sd,
            CASE WHEN sd IS NULL OR sd = 0.0 THEN NULL
                 ELSE (value - mu) / sd END AS z,
            ABS(CASE WHEN sd IS NULL OR sd = 0.0 THEN NULL
                     ELSE (value - mu) / sd END) > 3.0 AS is_anom
          FROM staged""",

    "q113_walk_forward" ->
      s"""WITH daily AS ($dailyCloseSql),
          staged AS (
            SELECT d, close,
              LAG(close, 1) OVER (ORDER BY d) AS prev,
              NTILE(5) OVER (ORDER BY d) AS fold
            FROM daily),
          err AS (SELECT fold, d, close - prev AS err
                  FROM staged WHERE prev IS NOT NULL)
          SELECT CAST(fold AS INT) AS fold, COUNT(*) AS n_days,
            MIN(d) AS from_d, MAX(d) AS to_d,
            ${SqlFragments.r15("AVG(ABS(err))", 4)} AS mae,
            SQRT(${SqlFragments.r15("AVG(err * err)", 4)}) AS rmse
          FROM err GROUP BY fold""",

    "q115_rolling_corr" ->
      s"""WITH rev AS (SELECT CAST(o_orderdate AS DATE) AS d,
                       ${SqlFragments.r15("SUM(o_totalprice)", 2)} AS rev
                       FROM orders GROUP BY 1),
          vol AS (SELECT CAST(l_shipdate AS DATE) AS d,
                  ${SqlFragments.r15("SUM(l_quantity)", 2)} AS vol
                  FROM lineitem GROUP BY 1)
          SELECT d, rev, vol,
            ${SqlFragments.r15(
              "CORR(rev, vol) OVER (ORDER BY d ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)",
              6)} AS corr30
          FROM rev JOIN vol USING (d)""",

    "q116_seasonal_decomp" ->
      s"""WITH daily AS ($dailyCloseSql),
          st AS (SELECT d, close,
                 (d - DATE '1970-01-01') % 7 AS dow,
                 CASE WHEN COUNT(close) OVER w7 = 7
                      THEN ${SqlFragments.r15("AVG(close) OVER w7", 4)} END AS trend
                 FROM daily
                 WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          st2 AS (SELECT d, close, dow, trend, close - trend AS detr FROM st),
          seas AS (SELECT dow, ${SqlFragments.r15("AVG(detr)", 4)} AS seasonal
                   FROM st2 WHERE detr IS NOT NULL GROUP BY dow)
          SELECT d, close, trend, CAST(st2.dow AS BIGINT) AS dow, seasonal,
            close - trend - seasonal AS resid
          FROM st2 LEFT JOIN seas USING (dow)""",

    "q117_acf_ljung_box" -> {
      val numsSql = (1 to 7).map(k =>
        s"${SqlFragments.r15(s"SUM(dev * l$k)", 12)} AS n$k").mkString(", ")
      val lagsSql = (1 to 7).map(k =>
        s"LAG(dev, $k) OVER (ORDER BY d) AS l$k").mkString(", ")
      val caseSql = (1 to 7).map(k => s"WHEN $k THEN n$k").mkString(" ")
      s"""WITH daily AS ($dailyCloseSql),
          rets AS (SELECT d, close / prev - 1.0 AS ret FROM
                   (SELECT d, close, LAG(close, 1) OVER (ORDER BY d) AS prev
                    FROM daily) WHERE prev IS NOT NULL),
          stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                    ${SqlFragments.r15("AVG(ret)", 12)} AS mu FROM rets),
          dev AS (SELECT d, n, ret - mu AS dev FROM rets, stats),
          lagd AS (SELECT d, n, dev, $lagsSql FROM dev),
          one AS (SELECT n, ${SqlFragments.r15("SUM(dev * dev)", 12)} AS denom,
                  $numsSql FROM lagd GROUP BY n),
          ks AS (SELECT n, denom, t.k, CASE t.k $caseSql END AS num
                 FROM one, (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS k) t),
          acf AS (SELECT CAST(k AS BIGINT) AS k, n, num / denom AS acf FROM ks)
          SELECT k, acf,
            n * (n + 2.0) *
              ${SqlFragments.r15(
                "SUM(acf * acf / (n - k)) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
                14)} AS lb_q
          FROM acf"""
    },

    "q114_drawdown_vwap" ->
      s"""WITH daily AS (
            SELECT CAST(l_shipdate AS DATE) AS d,
              ${SqlFragments.r15("SUM(l_extendedprice * l_quantity)", 2)} AS pv,
              ${SqlFragments.r15("SUM(l_quantity)", 2)} AS vol
            FROM lineitem GROUP BY 1),
          v AS (SELECT d, vol, pv / vol AS vwap FROM daily)
          SELECT d, vwap, vol,
            MAX(vwap) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
            vwap / MAX(vwap) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1.0 AS drawdown
          FROM v"""
  )
}
