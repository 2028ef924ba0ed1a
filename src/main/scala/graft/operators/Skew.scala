package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the 100 TB design rule:
  * a handful of dominant keys must not serialize a stage). AQE's skew
  * join handles sort-merge cases at runtime — PlanShapeSpec ("AQE
  * splits a skewed sort-merge join") pins `OptimizeSkewedJoin`
  * splitting a synthetic hot key, so for a plain shuffled equi-join
  * prefer AQE over manual salting. These explicit forms cover what AQE
  * can't re-plan: skewed AGGREGATIONS (`saltedSumCount` — skew-join
  * splitting doesn't apply to a hash aggregate's partitioning) and
  * joins whose partitioning must stay deterministic across stages
  * (bucketed/co-partitioned layouts, where a runtime split would break
  * the co-location the layout exists to provide).
  */
object Skew {

  /** Two-phase salted aggregation: count per (key, salt) partial, then
    * merge partials per key. Turns one hot key into `salts` parallel
    * partials. Works for any algebraic aggregate expressed as
    * (partial, merge) column pairs — here sum/count, the common case.
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valCol: String,
                     salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("cnt"))

  /** Salted broadcast-side-replicated join for a skewed fact side
    * against a small-but-not-tiny dim that can't broadcast: replicate
    * each dim row `salts` times, salt the fact rows, join on
    * (key, salt). Spreads each hot key over `salts` reducers.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Keys holding more than `minFrac` of the fact rows — the salt
    * candidates. ONE corpus scan: the map-side-combined per-key agg
    * materializes once (`localCheckpoint` — O(distinct keys) rows),
    * then the total and the threshold filter are two jobs over that
    * small frame, not two more passes over the fact. The hot set is
    * BOUNDED by construction (at most 1/minFrac keys can each exceed
    * a minFrac share), so collecting it to the driver is O(1/minFrac),
    * never O(distinct keys). When even the per-key agg OUTPUT is too
    * large to materialize (extreme key cardinality), use
    * [[hotKeysSketch]] — the two-path join doesn't care how the set
    * was found, only that it's small.
    */
  def hotKeys(fact: DataFrame, key: String, minFrac: Double): Seq[Any] = {
    require(minFrac > 0.0 && minFrac <= 1.0)
    // NULL keys never equi-join, so salting them is pointless —
    // exclude them from both the candidates and the total, which also
    // keeps the exact and sketch paths byte-identical (the sketch
    // aggregate skips nulls like any aggregate)
    val keyCounts = fact.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .localCheckpoint()
    val totalRow = keyCounts.agg(sum(col("_n"))).head()
    if (totalRow.isNullAt(0)) Seq.empty
    else hotFromCounts(keyCounts, key, minFrac, totalRow.getLong(0))
  }

  /** [[hotKeys]] with a caller-known row total — a genuinely
    * single-job detection: one agg, one bounded collect. `total` must
    * be the NON-NULL-keyed row count (the universe the shares are
    * measured against, matching the self-counting overload and the
    * sketch path); a stats-derived all-rows total on a null-heavy fact
    * would understate every share.
    */
  def hotKeys(fact: DataFrame, key: String, minFrac: Double,
              total: Long): Seq[Any] = {
    require(minFrac > 0.0 && minFrac <= 1.0)
    hotFromCounts(fact.where(col(key).isNotNull)
        .groupBy(col(key)).agg(count(lit(1)).as("_n")),
      key, minFrac, total)
  }

  private def hotFromCounts(keyCounts: DataFrame, key: String,
                            minFrac: Double, total: Long): Seq[Any] =
    keyCounts.where(col("_n") > lit(minFrac * total))
      .select(col(key))
      .collect().map(_.get(0)).toSeq.sortBy(String.valueOf(_))

  /** Sketch-path hot-key detection for EXTREME key cardinality, where
    * exact per-key counts are themselves too large to materialize: one
    * corpus pass folds a Misra–Gries candidate table (bounded, and a
    * guaranteed superset of every key above `minFrac` — MG undercounts
    * by at most n/(k+1) even across merges, and k is sized to
    * 2/minFrac) plus a Count-Min sketch into a single
    * [[graft.expressions.HeavyHittersAgg]] buffer; the candidates are
    * then probed against the sketch ([[graft.expressions.CmsEstimate]])
    * — a post-aggregation, candidate-sized projection. State is
    * O(1/minFrac + 1/eps) per task whatever the cardinality.
    *
    * Guarantee: never MISSES a truly hot key (MG superset + CMS
    * overestimates); may admit keys within `eps` of the threshold —
    * benign for salting, where a borderline key on the salted path
    * costs one extra dim replication.
    */
  def hotKeysSketch(fact: DataFrame, key: String, minFrac: Double,
                    eps: Double = 1e-3, conf: Double = 0.99): Seq[Any] = {
    require(minFrac > 0.0 && minFrac <= 1.0)
    val hh = fact.agg(graft.expressions.HeavyHittersAgg(
      col(key), hhCounters(minFrac), eps, conf).as("hh"))
    admitHot(hh.select(col("hh.total"), col("hh.cms"), col("hh.candidates")),
        minFrac)
      .collect().map(_.get(0)).toSeq.sortBy(String.valueOf(_))
  }

  /** MG counter count for the superset guarantee at `minFrac` —
    * k >= 2/minFrac - 1 keeps every truly hot key's counter positive
    * through any merge tree (see [[graft.expressions.HeavyHittersAgg]]).
    */
  def hhCounters(minFrac: Double): Int =
    math.max(1, math.ceil(2.0 / minFrac).toInt)

  /** The frame-level admission gate over an evaluated heavy-hitter
    * buffer — one row of (total, cms, candidates) — shared by the
    * batch collector above and the streaming hot-key query (q226), so
    * batch and streaming can never drift on the admission rule.
    * @return one row per admitted hot key (the exploded candidate)
    */
  def admitHot(hhFrame: DataFrame, minFrac: Double): DataFrame =
    hhFrame
      .select(col("total").as("_t"), col("cms").as("_cms"),
        explode(col("candidates")).as("_cand"))
      .where(graft.expressions.CmsEstimate(col("_cms"), col("_cand"))
        > col("_t") * lit(minFrac))
      .select(col("_cand"))

  /** Hot-key-only salted join: [[saltedJoin]] taxes EVERY key with a
    * `salts`× dim replication — at large dim scale that replication IS
    * the dominant shuffle. Here only the detected hot keys (above
    * `minFrac` of the fact) take the salted path, with just their dim
    * rows replicated; the cold remainder joins untouched. The hot set
    * is a bounded literal (≤ 1/minFrac keys), so both branch
    * predicates are codegen'd IN-lists, and the union is of two
    * independently-planned joins — AQE still broadcasts the cold dim
    * side if it's small. Output rows are identical to a plain join
    * (spec-pinned, and q191 grades it against the plain-join oracle).
    *
    * Lineage note: the fact lineage executes three times (detection
    * agg eagerly at call time, then the hot and cold branches each
    * rescan). For a fact that is a plain table scan that's the right
    * trade (scans are cheap, materialization isn't); a fact that is
    * itself an EXPENSIVE derived frame should be
    * `localCheckpoint`/persisted by the caller first — both so the
    * upstream work runs once and so a nondeterministic input can't
    * disagree between detection and join.
    */
  def saltedJoinHot(fact: DataFrame, dim: DataFrame, key: String,
                    minFrac: Double = 0.05, salts: Int = 16,
                    sketch: Boolean = false): DataFrame = {
    // the two-path join doesn't care how the hot set was found — only
    // that it's small: `sketch = true` swaps in the bounded-state
    // detector for extreme key cardinality (may admit within-eps
    // borderline keys, which merely take the salted path; the output
    // rows are identical either way — spec-pinned)
    val hot = if (sketch) hotKeysSketch(fact, key, minFrac)
              else hotKeys(fact, key, minFrac)
    if (hot.isEmpty) fact.join(dim, Seq(key))
    else {
      val isHot = col(key).isin(hot: _*)
      val salted = saltedJoin(fact.where(isHot), dim.where(isHot), key, salts)
      val cold = fact.where(!isHot).join(dim.where(!isHot), Seq(key))
      salted.unionByName(cold)
    }
  }
}
