package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistical operators whose built-in counterparts buffer
  * whole groups in a single task.
  */
object Stats {

  /** Exact interpolated median per key (same semantics as
    * `percentile(v, 0.5)`), in a partial-agg-friendly two-pass shape:
    *
    *   1. hash-aggregate (key, value) occurrence counts — map-side
    *      combined, so the shuffle carries distinct values, not rows;
    *   2. running-offset window over the (key-partitioned, value-sorted)
    *      count rows picks the one or two straddling values and
    *      interpolates.
    *
    * Built-in `percentile()` materializes every value of a group inside
    * one aggregation buffer — a per-task memory bomb when keys are few
    * and groups are huge (the q30 shape at 100 TB). Here no task ever
    * holds more than its partition's share of DISTINCT (key, value)
    * pairs; for continuous data that is still the row count in the
    * worst case, but spread across the cluster by (key, value) hash
    * rather than concentrated per key.
    *
    * Difference from the built-in: a key whose values are ALL null is
    * absent from the output (the built-in emits a null median for it) —
    * null values carry no rank information, so the group has no median
    * to compute.
    */
  def exactMedian(df: DataFrame, keyCol: String, valCol: String,
                  outCol: String = "median"): DataFrame = {
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(col(keyCol), col(valCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val run = Window.partitionBy(keyCol).orderBy("_v")
    // per-key totals as an aggregate + broadcast join, NOT a
    // whole-partition window: an unordered window frame buffers every
    // partition row for a second full pass just to attach one number
    // per key; this agg partial-combines map-side to |keys| rows and
    // AQE reuses the counts exchange for both branches
    val totals = counts.groupBy(col(keyCol)).agg(sum("_c").as("_n"))
    val cum = counts
      .withColumn("_hi", sum("_c").over(run))        // ranks covered: [_lo, _hi)
      .withColumn("_lo", col("_hi") - col("_c"))
      .join(broadcast(totals), Seq(keyCol))
    // interpolated median at 0-based position (n-1)/2, exactly the
    // built-in percentile's rule: vlow + frac * (vhigh - vlow)
    val pos = (col("_n") - 1) / 2.0
    val lowIdx = floor(pos)
    val highIdx = ceil(pos)
    cum
      .where((col("_lo") <= lowIdx && lowIdx < col("_hi")) ||
        (col("_lo") <= highIdx && highIdx < col("_hi")))
      .groupBy(col(keyCol), col("_n"))
      .agg(
        min(when(col("_lo") <= lowIdx && lowIdx < col("_hi"), col("_v"))).as("_vlow"),
        min(when(col("_lo") <= highIdx && highIdx < col("_hi"), col("_v"))).as("_vhigh"))
      .select(col(keyCol),
        (col("_vlow") + (pos - floor(pos)) * (col("_vhigh") - col("_vlow"))).as(outCol))
  }

  /** Exact interpolated percentiles per key, several at once — the same
    * two-pass count/offset shape as [[exactMedian]] (one hash-agg of
    * distinct (key, value) counts, one running-offset window), with ALL
    * requested quantiles picked out of the single pass: the per-p
    * straddle rows are selected by one OR-filter and reduced by per-p
    * conditional mins, so asking for 5 percentiles costs the same two
    * shuffles as asking for one.
    *
    * @return (keyCol, p, outCol) rows, one per requested percentile per
    *         key; same interpolation rule as the built-in
    *         `percentile(v, p)` (vlow + frac·(vhigh − vlow) at 0-based
    *         position (n−1)·p).
    */
  def exactPercentiles(df: DataFrame, keyCol: String, valCol: String,
                       ps: Seq[Double], outCol: String = "pct"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0), s"bad ps: $ps")
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(col(keyCol), col(valCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val run = Window.partitionBy(keyCol).orderBy("_v")
    val totals = counts.groupBy(col(keyCol)).agg(sum("_c").as("_n"))
    val cum = counts
      .withColumn("_hi", sum("_c").over(run))
      .withColumn("_lo", col("_hi") - col("_c"))
      .join(broadcast(totals), Seq(keyCol))
    def pos(p: Double) = (col("_n") - 1) * p
    def straddles(idx: org.apache.spark.sql.Column) =
      col("_lo") <= idx && idx < col("_hi")
    val anyStraddle = ps.map { p =>
      straddles(floor(pos(p))) || straddles(ceil(pos(p)))
    }.reduce(_ || _)
    val aggs = ps.zipWithIndex.flatMap { case (p, i) => Seq(
      min(when(straddles(floor(pos(p))), col("_v"))).as(s"_vl$i"),
      min(when(straddles(ceil(pos(p))), col("_v"))).as(s"_vh$i"))
    }
    val picked = cum.where(anyStraddle)
      .groupBy(col(keyCol), col("_n"))
      .agg(aggs.head, aggs.tail: _*)
    val results = array(ps.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("p"),
        (col(s"_vl$i") + (pos(p) - floor(pos(p))) * (col(s"_vh$i") - col(s"_vl$i")))
          .as("pct"))
    }: _*)
    picked.select(col(keyCol), explode(results).as("_r"))
      .select(col(keyCol), col("_r.p").as("p"), col("_r.pct").as(outCol))
  }

  /** Robust per-group outlier gate (Iglewicz–Hoaglin modified z-score):
    * med = exact P50, mad = exact P50 of |x − med|, outlier iff
    * |0.6745·(x − med)/mad| > cut. The robust alternative to the
    * mean/stddev z-score a heavy-tailed quality distribution breaks
    * (one spam cluster drags the mean; it barely moves the median).
    *
    * Both medians come from [[exactPercentiles]] — the two-pass
    * count/offset shape, never a per-group sort buffer — and are
    * r15-rounded BEFORE the z so both engines gate on bit-identical
    * thresholds; the z itself is then pure per-row IEEE arithmetic.
    * Groups are assumed continuous-valued (mad > 0); a mad of 0 makes
    * the score undefined, as in any MAD formulation.
    * Output: one row per group — n, n_outliers, med, mad.
    */
  /** Population-stability-index drift between a BASE and a CURRENT
    * sample of one numeric column — the standard production monitor
    * for "did this feature's distribution move" (model inputs between
    * retrains, a table between snapshot versions). Bin edges are
    * `bins` equal widths over the BASE min/max (fixed reference frame:
    * current-only outliers clamp into the edge bins, which is what
    * makes edge-bin contributions spike on range drift); both samples
    * are Laplace-smoothed ((n+1)/(N+bins)) so empty bins never divide
    * by zero; contrib_i = (p_i − q_i)·ln(p_i/q_i), PSI = Σ contrib.
    *
    * Scale shape: one O(1) min/max agg on base, one binned hash agg
    * per side (map-side combined, `bins` output rows), a spine join on
    * the O(bins) frame. Nothing corpus-sized ever sorts or shuffles
    * beyond the two bin aggs. Output: one row per bin — bin, n_base,
    * n_cur, contrib (r15-stabilized; PSI is their sum).
    */
  def psiDrift(base: DataFrame, cur: DataFrame, valCol: String,
               bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val spark = base.sparkSession
    val r = base.agg(min(col(valCol)).cast("double"),
      max(col(valCol)).cast("double")).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val width = (mx - mn) / bins
    def binned(df: DataFrame, as: String) = df
      .select((if (width == 0.0) lit(0L) else
        least(greatest(floor((col(valCol).cast("double") - mn) / width),
          lit(0L)), lit(bins - 1L))).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(as))
    val nb = base.count()
    val nc = cur.count()
    spark.range(bins).select(col("id").as("bin"))
      .join(binned(base, "n_base"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .withColumn("_p", (col("n_base") + 1).cast("double") / lit(nb + bins).cast("double"))
      .withColumn("_q", (col("n_cur") + 1).cast("double") / lit(nc + bins).cast("double"))
      .select(col("bin"), col("n_base"), col("n_cur"),
        graft.functions.NumFns.stableRound(
          (col("_p") - col("_q")) * log(col("_p") / col("_q")), 8).as("contrib"))
  }

  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
                  cut: Double = 3.5): DataFrame = {
    val med = exactPercentiles(df, keyCol, valCol, Seq(0.5))
      .groupBy(col(keyCol))
      .agg(graft.functions.NumFns.stableRound(min(col("pct")), 6).as("med"))
    val dev = df.join(broadcast(med), Seq(keyCol))
      .withColumn("_dev", abs(col(valCol) - col("med")))
    val mad = exactPercentiles(dev, keyCol, "_dev", Seq(0.5))
      .groupBy(col(keyCol))
      .agg(graft.functions.NumFns.stableRound(min(col("pct")), 6).as("mad"))
    dev.join(broadcast(mad), Seq(keyCol))
      .withColumn("_z",
        lit(0.6745) * (col(valCol) - col("med")) / col("mad"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("_z")) > lit(cut), 1L).otherwise(0L)).as("n_outliers"),
        min(col("med")).as("med"), min(col("mad")).as("mad"))
  }

  /** Equal-frequency (quantile) binning per key — the feature
    * discretization step (decile features, calibration buckets): the
    * k−1 interior cutpoints come from ONE [[exactPercentiles]] pass
    * (r15-rounded so both engines compare against bit-identical
    * edges), collect into an O(k) array per key, broadcast back, and
    * every row's bin is the count of cutpoints strictly below its
    * value — a searchsorted over a tiny in-row array, zero extra
    * shuffles beyond the percentile pass. Heavily tied distributions
    * can merge adjacent bins (duplicate cutpoints), the standard
    * equal-frequency degeneracy; the assignment stays deterministic.
    * Returns the input plus `bin` (0-based).
    */
  def equalFreqBins(df: DataFrame, keyCol: String, valCol: String,
                    k: Int): DataFrame = {
    require(k >= 2, s"bad k=$k")
    val cuts = exactPercentiles(df, keyCol, valCol,
        (1 until k).map(_.toDouble / k), "cut")
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(
        graft.functions.NumFns.stableRound(col("cut"), 6))).as("_cuts"))
    df.where(col(valCol).isNotNull)
      .join(broadcast(cuts), Seq(keyCol))
      .withColumn("bin", aggregate(col("_cuts"), lit(0L),
        (acc, c) => acc + when(col(valCol) > c, 1L).otherwise(0L)))
      .drop("_cuts")
  }

  /** Bounded-relative-error quantile SKETCH per key — the
    * DDSketch/HdrHistogram bucketing family, in its integer-exact
    * power-of-two form so a SQL oracle replays the whole sketch
    * hash-identically (no floating-point log anywhere):
    *
    * positive integer values map to log2 buckets with `subBits` linear
    * sub-buckets each — `e = len(bin(v)) - 1`,
    * `bucket = (e-m+1)·2^m + (v >> (e-m)) - 2^m` (values below 2^m map
    * to themselves, exactly) — pure shifts and bit-length, identical
    * in any engine's integer SQL. The quantile estimate is the
    * matched bucket's LOWER BOUND `(2^m + s) << (e-m)`, so
    * `est ≤ true value < est·(1 + 2^-m)`: guaranteed relative error
    * below 2^-subBits (0.8% at the default 7).
    *
    * Why this beats the exact two-pass [[exactPercentiles]] at 100 TB:
    * the state is O(keys × 64·2^m) bucket counts — CONSTANT per key,
    * additive, and mergeable (counts sum) — vs O(distinct values).
    * One map-side-combined hash agg reduces the full fact table to
    * that constant before any shuffle; the cumulative window then
    * runs on the tiny bucket table. Mergeability is what the exact
    * path can never give: pre-aggregated per-partition (or per-day)
    * bucket counts roll up by addition, the [[IncrementalAgg]] MV
    * pattern.
    *
    * Non-positive values are out of contract (dropped): the log-domain
    * sketch is defined on v ≥ 1 — shift/offset first for signed data.
    * Output: (keyCol, n, p<q> per requested quantile), quantile label
    * p50/p99/p99_9 style.
    */
  def relQuantiles(df: DataFrame, keyCol: String, valCol: String,
                   qs: Seq[Double], subBits: Int = 7): DataFrame =
    relQuantilesFromCounts(bucketCounts(df, keyCol, valCol, subBits),
      keyCol, "_b", "_c", qs, subBits)

  /** The shared sketch-state construction (v ≥ 1 contract + bucket +
    * map-side-combined counts) both the quantile and the rank paths
    * build on — one copy so they can never diverge.
    */
  private def bucketCounts(df: DataFrame, keyCol: String, valCol: String,
                           subBits: Int): DataFrame =
    df.where(col(valCol).cast("long") >= 1)
      .select(col(keyCol), relBucket(col(valCol), subBits).as("_b"))
      .groupBy(col(keyCol), col("_b"))
      .agg(count(lit(1)).as("_c"))

  /** The log2/sub-bucket index of a positive integer value — the
    * mergeable-additive sketch state [[relQuantiles]] aggregates and
    * [[relQuantilesFromCounts]] serves from. Exposed so bucket COUNTS
    * can live wherever additive state lives (an [[IncrementalAgg]]
    * materialized view, a per-shard rollup) and merge by plain
    * addition. Caller guarantees v ≥ 1 (cast to long).
    */
  def relBucket(v: Column, subBits: Int): Column = {
    require(subBits >= 1 && subBits <= 16, s"bad subBits=$subBits")
    val m = subBits
    val base = 1L << m
    val vl = v.cast("long")
    val e = (length(bin(vl)) - 1).cast("long")
    when(vl < base, vl)
      .otherwise((e - m + 1) * base + shiftRightCol(vl, e - m) - base)
  }

  /** Lower bound of a [[relBucket]] bucket — the quantile estimate's
    * representative value: `est ≤ true < est·(1 + 2^-subBits)`.
    */
  def relRep(b: Column, subBits: Int): Column = {
    val m = subBits
    val base = 1L << m
    // bucket ids are tiny (≤ (63-m+1)·2^m), so the floor division is
    // exact through doubles; shifts ride the catalyst expressions
    val k = (b.cast("double") / base).cast("long")
    when(b < base, b)
      .otherwise(shiftLeftCol(lit(base) + pmod(b, lit(base)), k - 1))
  }

  private def shiftRightCol(v: Column, shift: Column): Column =
    graftExpr(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      bridgeE(v), bridgeE(shift.cast("int"))))
  private def shiftLeftCol(v: Column, shift: Column): Column =
    graftExpr(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      bridgeE(v), bridgeE(shift.cast("int"))))
  private def bridgeE(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expressionEager(c)
  private def graftExpr(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Plain-Scala mirror of [[relBucket]] for driver-side probe values
    * (kept in lockstep — RelQuantileSpec pins them equal).
    */
  def relBucketOf(v: Long, subBits: Int): Long = {
    require(v >= 1, s"relBucket domain is v >= 1, got $v")
    val m = subBits
    val base = 1L << m
    if (v < base) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      (e - m + 1) * base + (v >>> (e - m)) - base
    }
  }

  /** Inverse quantile (CDF probes) from the same sketch: for each
    * probe value, the number of rows per key whose BUCKET is
    * at-or-below the probe's bucket — rank with the same 2^-subBits
    * value-axis tolerance, from the same O(keys × buckets) additive
    * state, zero extra passes over the data. Deterministic and
    * integer-exact (the probe's bucket is the same arithmetic), so an
    * oracle replays it hash-identically. Output:
    * (keyCol, n, le_<probe> …).
    */
  def relRanks(df: DataFrame, keyCol: String, valCol: String,
               probes: Seq[Long], subBits: Int = 7): DataFrame = {
    require(probes.nonEmpty && probes.forall(_ >= 1), s"bad probes=$probes")
    val counts = bucketCounts(df, keyCol, valCol, subBits)
    val aggs = sum(col("_c")).as("n") +: probes.map(p =>
      sum(when(col("_b") <= relBucketOf(p, subBits), col("_c"))
        .otherwise(0L)).as(s"le_$p"))
    counts.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** A requested quantile as the exact rational (num, den) its decimal
    * spelling means: 0.99 → 99/100, 0.5 → 5/10. The rank pick is then
    * pure integer arithmetic — `(n·num + den − 1) div den` IS the
    * mathematical ceil(q·n) — where `ceil(q·n)` through IEEE doubles is
    * off by one for some (q, n) pairs (double(0.1)·10 rounds above 1.0,
    * so its ceil is 2): the sketch walk stays integer-exact end to end,
    * rank pick included.
    */
  private def qAsRational(q: Double): (Long, Long) = {
    val bd = java.math.BigDecimal.valueOf(q).stripTrailingZeros
    val (num, den) =
      if (bd.scale <= 0) (bd.toBigIntegerExact.longValueExact, 1L)
      else (bd.unscaledValue.longValueExact,
        java.math.BigDecimal.ONE.movePointRight(bd.scale)
          .toBigIntegerExact.longValueExact)
    // n·num must stay inside Long for any real row count: cap the
    // denominator so a quantile like a raw double third (17 decimal
    // digits) fails loudly instead of silently overflowing the rank
    require(den <= 1000000L,
      s"quantile $q needs > 6 decimal digits — spell it as a <= 6-decimal " +
        "value (the rank arithmetic is exact integer, n*num must fit Long)")
    (num, den)
  }

  /** The exact rank `ceil(q·n)` of quantile `q` over `n` rows, as
    * integer arithmetic on a LongType `n` column (see [[qAsRational]];
    * n·num stays far inside Long for any decimal-spelled q and
    * realistic n).
    */
  private def exactRank(n: Column, q: Double): Column = {
    val (num, den) = qAsRational(q)
    graftExpr(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      bridgeE(n * num + (den - 1L)), bridgeE(lit(den)),
      evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
      .cast("long")
  }

  /** Serve quantiles from pre-aggregated [[relBucket]] counts — the
    * read side of sketch-counts-as-MV-state. ONE map-side-combinable
    * hash aggregate per key: the bucket table collects into an O(64·2^m)
    * sorted in-row array (bounded by the sketch's construction, never
    * by the data), and the per-key total plus every rank pick come from
    * a single per-row fold over that array. No whole-partition window
    * (the old form buffered each key's frame in one task — a real
    * reducer at 100 TB key cardinality) and no totals self-join (which
    * trips conflicting-reference resolution when the counts come from a
    * just-materialized streaming memory sink — q216). Ranks are picked
    * at the EXACT ceil(q·n) via integer arithmetic ([[exactRank]]);
    * duplicate bucket rows per key (pre-merged MV shards) just
    * accumulate in the fold. Same output contract as [[relQuantiles]]:
    * (keyCol, n, p<q>…) with lower-bound representatives.
    */
  def relQuantilesFromCounts(counts: DataFrame, keyCol: String,
                             bucketCol: String, cntCol: String,
                             qs: Seq[Double], subBits: Int = 7): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad qs=$qs")
    val perKey = counts
      .select(col(keyCol), col(bucketCol).as("_b"), col(cntCol).as("_c"))
      .groupBy(col(keyCol))
      .agg(sum(col("_c")).as("n"),
        array_sort(collect_list(struct(col("_b"), col("_c")))).as("_bl"))
    def label(q: Double) = "p" + BigDecimal(q * 100).underlying
      .stripTrailingZeros.toPlainString.replace(".", "_")
    // first bucket whose cumulative count reaches the rank: a fold
    // carrying (cum, picked) over the sorted bucket array — O(buckets)
    // per key-row, fully inside codegen'd projection
    def pickAt(rank: Column): Column = {
      val folded = aggregate(col("_bl"),
        struct(lit(0L).as("cum"), lit(null).cast("long").as("b")),
        (acc, x) => struct(
          (acc.getField("cum") + x.getField("_c")).as("cum"),
          when(acc.getField("b").isNull &&
               acc.getField("cum") + x.getField("_c") >= rank, x.getField("_b"))
            .otherwise(acc.getField("b")).as("b")))
      relRep(folded.getField("b"), subBits)
    }
    perKey.select(col(keyCol) +: col("n") +:
      qs.map(q => pickAt(exactRank(col("n"), q)).as(label(q))): _*)
  }

  /** Per-key ordinary least squares from EXACT integer sufficient
    * statistics — the trend fit a metrics pipeline runs per entity:
    * one hash aggregation collects (n, Σx, Σy, Σxy, Σx², Σy²) as
    * BIGINTs (x and y must be integral — exact to 2^63, callers scale
    * doubles to cents/ticks first), and slope/intercept/R² are pure
    * double functions OF those integers — bit-identical in any IEEE
    * engine, unlike the built-in `regr_*` aggregates whose streaming
    * double accumulation is order-dependent. One shuffle, no window,
    * O(1) state per key. Degenerate keys (n < 2 or zero x-variance)
    * yield NULL fit columns.
    */
  def olsPerKey(df: DataFrame, keyCol: String, xCol: String,
                yCol: String): DataFrame = {
    val agg = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col(xCol).cast("long")).as("sx"),
      sum(col(yCol).cast("long")).as("sy"),
      sum(col(xCol).cast("long") * col(yCol).cast("long")).as("sxy"),
      sum(col(xCol).cast("long") * col(xCol).cast("long")).as("sxx"),
      sum(col(yCol).cast("long") * col(yCol).cast("long")).as("syy"))
    agg.select(col(keyCol), col("n"),
      (col("n") * col("sxy") - col("sx") * col("sy")).as("_cxy"),
      (col("n") * col("sxx") - col("sx") * col("sx")).as("_cxx"),
      (col("n") * col("syy") - col("sy") * col("sy")).as("_cyy"),
      col("sx"), col("sy"))
      .select(col(keyCol), col("n"),
        when(col("n") >= 2 && col("_cxx") =!= 0,
          col("_cxy").cast("double") / col("_cxx").cast("double")).as("slope"),
        when(col("n") >= 2 && col("_cxx") =!= 0,
          (col("sy").cast("double") -
            col("_cxy").cast("double") / col("_cxx").cast("double") *
              col("sx").cast("double")) / col("n").cast("double")).as("intercept"),
        when(col("n") >= 2 && col("_cxx") =!= 0 && col("_cyy") =!= 0,
          col("_cxy").cast("double") * col("_cxy").cast("double") /
            (col("_cxx").cast("double") * col("_cyy").cast("double"))).as("r2"))
  }

  /** ANALYZE-style EXACT column statistics in one pass: per requested
    * column, one long-format row (column, n_rows, n_nonnull, n_null,
    * ndv, min_s, max_s) — the table profile a catalog stores for CBO
    * and a data-quality report prints.
    *
    * Shape: ONE aggregation carrying every column's count/ndv/min/max;
    * the k exact `countDistinct`s plan through Catalyst's Expand (×k
    * input inflation) — the textbook ANALYZE cost, paid rarely and by
    * an explicit command, never inside a query. The approximate path
    * for routine refresh is the HLL/bucket-sketch family (q88/q218).
    * min/max stringify through CAST for the uniform long schema —
    * exact for integers/dates/strings; floating columns are
    * engine-repr-dependent and belong in the numeric profilers
    * instead.
    */
  def analyzeColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "analyzeColumns: no columns")
    val aggs = count(lit(1)).as("_n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"_nn_$c"),
      countDistinct(col(c)).as(s"_ndv_$c"),
      min(col(c)).cast("string").as(s"_min_$c"),
      max(col(c)).cast("string").as(s"_max_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("_n").as("n_rows"),
        col(s"_nn_$c").as("n_nonnull"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_ndv_$c").as("ndv"),
        col(s"_min_$c").as("min_s"),
        col(s"_max_$c").as("max_s"))): _*)).as("_r"))
      .select(col("_r.*"))
  }
}
