package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixture resampling for training-data assembly: rebalance a corpus
  * across a grouping key (language, source domain, quality bucket) by
  * temperature-scaling the group proportions — the standard multilingual
  * / multi-domain mixing step (e.g. the T5/mC4 alpha-sampling shape).
  *
  * Each group k with count n_k gets a replication rate
  * `rate_k = (n_max / n_k)^(1 - tau)`: tau = 1 keeps the natural
  * distribution (rate 1 everywhere), tau = 0 fully flattens it (every
  * group replicated up to the largest), tau in between up-samples the
  * tail sublinearly. Rates are >= 1 by construction — rebalancing is
  * done by replication against the LARGEST group, never by discarding
  * data (epochs-over-rare-languages, not subsampling-the-head).
  *
  * Per-row copies = floor(rate) + Bernoulli(rate - floor(rate)), with
  * the Bernoulli decided by a 31-bit LCG over the row id — fully
  * deterministic, replayable in plain SQL by any engine (the q69
  * oracle replays it bit-for-bit), and stable under re-partitioning
  * (no RNG seeded by partition index).
  *
  * Scale shape: one tiny groupBy(key) agg (O(groups) rows), a scalar
  * max, a broadcast join of the rates back onto the corpus, and a
  * per-row `explode(sequence(...))` — the corpus itself is never
  * shuffled.
  */
object Mixer {

  /** 31-bit LCG fraction in [0, 1) from a row-id column — glibc
    * constants, plain BIGINT arithmetic (exact in any engine).
    */
  def lcgFrac(id: Column): Column =
    ((id * 1103515245L + 12345L) % 2147483648L).cast("double") / 2147483648.0

  /** Exactly-k-per-group deterministic sample: rank rows inside each
    * group by the LCG hash of their id (a uniform deterministic
    * shuffle) and keep the first k. Unlike Bernoulli sampling
    * (`sampleBy`, [[temperatureResample]]'s fractional part) the output
    * size is exact — the shape eval-set construction and per-domain
    * caps need. One keyed shuffle; the rank is a per-group window with
    * the WindowGroupLimit pushdown, so no group ever buffers more than
    * k rows per partition.
    */
  def exactKPerGroup(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(lcgFrac(col(idCol)), col(idCol))
    df.withColumn("_rk", row_number().over(w)).where(col("_rk") <= k).drop("_rk")
  }

  /** Stratified proportional sample with an EXACT total budget:
    * allocate `budget` across the strata by largest-remainder
    * apportionment (Hamilton's method — floor of the proportional
    * quota, then the leftover seats to the largest integer remainders,
    * ties by key), and draw exactly that many rows per stratum by the
    * deterministic LCG order. Output size == min(budget, |df|) exactly —
    * what Bernoulli `sampleBy` fractions only hit in expectation.
    *
    * All apportionment arithmetic is integer (budget·n_k DIV/MOD total)
    * so any engine replays it exactly; the allocation table is
    * O(strata) rows (windows over the agg output, then broadcast back).
    * Per-corpus cost: one tiny agg + one keyed shuffle for the
    * per-stratum rank — same shape as [[exactKPerGroup]], with the cap
    * joined in instead of constant.
    *
    * Emits the stratum key, row id, `pick_rank` (1-based LCG rank inside
    * the stratum) and `alloc` (the stratum's quota).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, idCol: String,
                       budget: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val allWin = W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val alloc = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_tot", sum(col("_n")).over(allWin))
      .withColumn("_base", expr(s"(${budget}L * _n) DIV _tot"))
      .withColumn("_rem", expr(s"(${budget}L * _n) % _tot"))
      .withColumn("_sumbase", sum(col("_base")).over(allWin))
      .withColumn("_rrk",
        row_number().over(W.orderBy(col("_rem").desc, col(keyCol))).cast("long"))
      .select(col(keyCol),
        (col("_base") + when(col("_rrk") <= lit(budget) - col("_sumbase"), 1L)
          .otherwise(0L)).as("alloc"))
    val w = W.partitionBy(col(keyCol)).orderBy(lcgFrac(col(idCol)), col(idCol))
    df.select(col(keyCol), col(idCol))
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .join(broadcast(alloc), Seq(keyCol))
      .where(col("pick_rank") <= col("alloc"))
  }

  /** Deterministic global shuffle into training shards — the last step
    * before a corpus ships to a trainer: every row gets a pseudo-random
    * shard (uniform over `nShards`) and a pseudo-random position within
    * its shard, both pure LCG functions of the row id. No RNG state, no
    * partition-index dependence: any engine, any partitioning, any rerun
    * produces the identical layout (and the oracle replays it row for
    * row). One keyed shuffle on shard; the rank window is per-shard.
    *
    * Shard and position use DIFFERENT LCG streams (the position stream
    * re-hashes the shard stream's output) so co-sharded rows don't sort
    * by id order.
    */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val h1 = lcg31(col(idCol))
    val h2 = lcg31(h1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_h2"), col(idCol))
    df.withColumn("shard", pmod(h1, lit(nShards.toLong)))
      .withColumn("_h2", h2)
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("_h2")
  }

  /** Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-Res):
    * keep the k rows with the largest priority u^(1/w) — equivalently
    * the largest ln(u)/w for w > 0 (monotone transform; the log form
    * avoids `pow`, which IEEE-754 does not require to be correctly
    * rounded). u is a deterministic LCG uniform shifted to (0, 1) —
    * the +0.5/2^31 offset keeps u strictly positive so ln(u) is always
    * finite — making the draw replayable in plain SQL and invariant
    * under re-partitioning. Rows with non-positive weight can never be
    * drawn and are filtered.
    *
    * Scale shape: per-row arithmetic + one TakeOrderedAndProject
    * (per-partition top-k, then a k-sized merge on the driver) — no
    * shuffle of the corpus, no full sort. Emits the input columns plus
    * `es_key` (the priority, stabilized for cross-engine grading).
    */
  /** One 31-bit LCG step, total over ALL Long ids: the seed is first
    * reduced mod 2^31 (pmod — non-negative even for negative ids), so
    * the multiply tops out near 2^61 and can never wrap Long (the naive
    * `id * 1103515245 % 2^31` overflows for ids ≥ ~8.4e9, turning the
    * modulus negative and every downstream ln(u) null), and the final
    * pmod pins the output into [0, 2^31). For ids already in [0, 2^31)
    * — every graded corpus — the arithmetic is bit-identical to the
    * naive form, which is what the q100/q123/q221 oracles replay.
    */
  private def lcg31(seed: Column): Column =
    pmod(pmod(seed, lit(2147483648L)) * 1103515245L + 12345L,
      lit(2147483648L))

  /** The Efraimidis–Spirakis priority shared by both weighted
    * samplers — ONE copy, because the q123/q221 oracles are pinned to
    * this exact arithmetic: LCG-uniform from the id ([[lcg31]] —
    * defined for the full Long domain), ln(u)/w, decimal-pinned at
    * scale 12.
    */
  private def esKey(idCol: String, weightCol: String): Column = {
    val u = (lcg31(col(idCol)).cast("double") + 0.5) / 2147483648.0
    graft.functions.NumFns.stableRound(log(u) / col(weightCol), 12)
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame =
    df.where(col(weightCol) > 0)
      .withColumn("es_key", esKey(idCol, weightCol))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)

  /** [[weightedSample]] PER KEY: up to `k` rows from every group
    * (exactly `k` when the group has that many positive-weight rows —
    * rows with weight <= 0 are out of contract and dropped, as in
    * [[weightedSample]]), drawn without replacement proportional to
    * weight — the per-domain weighted subsample a training-mix builder
    * runs (cap each source at k docs, prefer high-quality ones,
    * deterministically). Same LCG-deterministic Efraimidis–Spirakis
    * priority; the per-group argmax is a rank window whose
    * WindowGroupLimit keeps only each partition's top-k per key ahead
    * of the shuffle, so the exchange carries O(k · keys) rows per
    * partition, never the corpus.
    */
  def weightedSamplePerKey(df: DataFrame, keyCol: String, idCol: String,
                           weightCol: String, k: Int): DataFrame =
    df.where(col(weightCol) > 0)
      .withColumn("es_key", esKey(idCol, weightCol))
      .withColumn("_r", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col(keyCol)).orderBy(col("es_key").desc, col(idCol))))
      .where(col("_r") <= k)
      .drop("_r")

  /** Resample `df` by temperature over `keyCol`, replicating each row
    * `copies` times; emits the input columns plus `copy_id` (1-based).
    *
    * tau = 0.5 is computed via `sqrt` rather than `pow`: IEEE-754
    * requires sqrt to be correctly rounded (bit-identical everywhere)
    * but makes no such promise for pow — and the oracle compares
    * copies counts derived from the rate's exact bits.
    */
  def temperatureResample(df: DataFrame, keyCol: String, idCol: String,
                          tau: Double): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
    // n_max via a whole-partition window over the O(groups) agg output:
    // an agg-of-agg via self-reference would execute `counts` (and its
    // corpus scan) twice — Spark has no common-subplan reuse across
    // separate join inputs
    val W = org.apache.spark.sql.expressions.Window
    val nmaxWin = W.partitionBy()
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val ratio = max(col("_n")).over(nmaxWin).cast("double") / col("_n")
    val rate = (if (tau == 0.5) sqrt(ratio) else pow(ratio, 1.0 - tau)).as("_rate")
    val rates = counts.select(col(keyCol), rate)
    df.join(broadcast(rates), Seq(keyCol))
      .withColumn("_copies",
        floor(col("_rate")).cast("long") +
          when(lcgFrac(col(idCol)) < col("_rate") - floor(col("_rate")), 1L).otherwise(0L))
      .withColumn("copy_id", explode(sequence(lit(1L), col("_copies"))))
      .drop("_rate", "_copies")
  }

  /** Training-mixture epoch plan: per source, how many epochs (repeats,
    * fractional) fill its share of a token budget — the planning table
    * a data-mixing run is driven by (weights from scaling-law tuning,
    * budget from the training plan). epochs above `maxEpochs` clamp and
    * flag the source as over-asked (the repeated-data rule: past ~4
    * epochs more repeats stop buying loss) — the shortfall is left to
    * the caller's renormalization, not silently shifted.
    *
    * One O(sources) keyed agg over the corpus; the weight table is a
    * broadcast. Pure per-row IEEE arithmetic after the exact-long
    * token sums — cross-engine stable raw.
    */
  /** Deterministic train/val/test assignment: split by the LCG
    * fraction of the row id against cumulative `fractions` boundaries
    * (e.g. 0.8/0.1/0.1). Hash-based, so the assignment is
    * partitioning-invariant, stable across reruns and appends (a doc
    * keeps its split forever — the property that prevents
    * train-on-test leakage when the corpus grows), and needs no
    * shuffle at all: one codegen'd projection.
    */
  def assignSplits(df: DataFrame, idCol: String,
                   names: Seq[String] = Seq("train", "val", "test"),
                   fractions: Seq[Double] = Seq(0.8, 0.1, 0.1)): DataFrame =
    assignSplitsBy(df, col(idCol), names, fractions)

  private def assignSplitsBy(df: DataFrame, key: Column, names: Seq[String],
                             fractions: Seq[Double]): DataFrame = {
    require(names.length == fractions.length && names.nonEmpty)
    require(math.abs(fractions.sum - 1.0) < 1e-9, s"fractions must sum to 1")
    val cum = fractions.scanLeft(0.0)(_ + _).tail
    val u = lcgFrac(key)
    val expr = names.zip(cum).init.foldRight(
      lit(names.last): org.apache.spark.sql.Column) {
      case ((name, hi), rest) => when(u < lit(hi), lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-free split assignment: near-duplicate CLUSTERS, not
    * documents, are the randomization unit. Hashing each doc id
    * independently ([[assignSplits]]) strands ~2·p·(1−p) of every
    * near-dup pair across the train/held-out boundary, so the test set
    * scores memorized near-copies of training docs. Here every doc
    * hashes by its cluster representative — connected components over
    * the verified near-dup pair set ([[Components]]), singletons by
    * their own id — so a whole cluster lands in exactly one split by
    * construction, and (like assignSplits) the assignment is stable as
    * the corpus grows — PROVIDED new docs take monotonically
    * increasing ids: the representative is the component min-id, so a
    * newcomer whose id undercuts the current rep would re-key (and so
    * re-split) the whole existing cluster exactly as a merge does.
    * With monotone ids a new member of an existing cluster inherits
    * the cluster's split. One remaining honest caveat even then: if
    * growth MERGES two existing clusters, the merged representative is
    * the min of the two reps, so one side's docs move to the other
    * side's split — inherent to any scheme that keeps clusters
    * split-pure, since the merged cluster must land on a single side.
    * Leakage-freedom is preserved throughout; only the train/test
    * ratio drifts by the merged cluster's size.
    *
    * Scale shape: the component label table is O(docs that have a
    * near-dup) — a small fraction of the corpus — joined back once on
    * the id key (AQE broadcasts it when small); the split itself is
    * the same shuffle-free LCG projection as [[assignSplits]], keyed
    * on `group_id`. Output: input columns + `group_id` + `split`.
    */
  def groupAwareSplits(docs: DataFrame, idCol: String,
                       pairs: DataFrame, aCol: String, bCol: String,
                       names: Seq[String] = Seq("train", "val", "test"),
                       fractions: Seq[Double] = Seq(0.8, 0.1, 0.1)): DataFrame = {
    val comp = Components.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("_cc_id"), col("comp").as("_cc_comp"))
    val grouped = docs.join(comp, docs(idCol) === comp("_cc_id"), "left")
      .withColumn("group_id",
        coalesce(col("_cc_comp"), col(idCol).cast("long")))
      .drop("_cc_id", "_cc_comp")
    assignSplitsBy(grouped, col("group_id"), names, fractions)
  }

  def epochPlan(docs: DataFrame, keyCol: String, tokensCol: Column,
                weights: DataFrame, weightKeyCol: String, weightCol: String,
                budget: Long, maxEpochs: Double = 4.0): DataFrame =
    docs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("n_tokens"))
      .join(broadcast(weights.select(col(weightKeyCol).as(keyCol),
        col(weightCol).as("weight"))), Seq(keyCol))
      .withColumn("planned_tokens", lit(budget.toDouble) * col("weight"))
      .withColumn("epochs_raw",
        col("planned_tokens") / col("n_tokens").cast("double"))
      .withColumn("epochs", least(col("epochs_raw"), lit(maxEpochs)))
      .withColumn("clamped", col("epochs_raw") > lit(maxEpochs))
      .withColumn("effective_tokens",
        col("epochs") * col("n_tokens").cast("double"))

  /** Per-domain document cap (the crawl-curation rule that stops one
    * giant domain from dominating the corpus): every row gets its
    * deterministic LCG `pick_rank` within its key and a `kept` flag
    * (rank <= cap). The full audit frame is emitted — kept AND
    * rejected — so downstream can both filter and report per-domain
    * rejection counts from one pass.
    *
    * One keyed shuffle for the per-key rank window. Emitting all rows
    * means no WindowGroupLimit pushdown applies (it can't — every row
    * is output); a caller that only needs the survivors should filter
    * on `kept` INSIDE the same job, which Spark pushes into the window
    * via the group-limit rule, as [[exactKPerGroup]] does.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"bad cap=$cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(lcgFrac(col(idCol)), col(idCol))
    df.withColumn("pick_rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("pick_rank") <= cap)
  }

  /** Length-bucketed batch assembly with padding accounting: group
    * rows into `bucketWidth`-wide length buckets, order each bucket by
    * the deterministic LCG stream, cut consecutive runs of `batchSize`
    * rows into batches, and report each batch's padded cost — a batch
    * pads every sequence to its max length, so
    * `padding_frac = 1 − Σlen / (max_len · n)`. This is the standard
    * trainer-side bucketing that turns a skewed length distribution
    * into near-rectangular batches (vs. random batching whose padding
    * waste tracks the global length variance).
    *
    * One keyed shuffle (the per-bucket rank window), one (bucket,
    * batch) hash agg. The emitted frame is O(batches), not O(rows);
    * `padding_frac` is a single int-derived division — bit-stable
    * cross-engine without rounding.
    */
  def lengthBucketedBatches(df: DataFrame, idCol: String, lenCol: String,
                            bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(lcgFrac(col(idCol)), col(idCol))
    df.withColumn("bucket", expr(s"`$lenCol` DIV $bucketWidth"))
      .withColumn("_rk", row_number().over(w).cast("long"))
      .withColumn("batch", expr(s"(_rk - 1) DIV $batchSize"))
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col(lenCol)).as("seq_len"),
        sum(col(lenCol)).as("sum_tokens"))
      .withColumn("padding_frac",
        lit(1.0) - col("sum_tokens").cast("double") /
          (col("seq_len") * col("n_docs")).cast("double"))
  }
}
