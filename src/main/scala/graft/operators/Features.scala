package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators for the model-training pipeline:
  * leakage-free target encoding and the hashing-trick vectorizer.
  * Both are one-or-two-hash-agg shapes with O(categories) or zero
  * broadcast state — nothing corpus-sized shuffles more than once.
  */
object Features {

  /** Out-of-fold (K-fold leakage-free) smoothed target encoding — the
    * standard categorical encoder for gradient-boosted / linear
    * models: each (category, fold) cell is encoded by the target mean
    * of the category's rows in the OTHER K−1 folds, shrunk toward the
    * global mean by `m` pseudo-observations
    * (enc = (sum_out + m·μ) / (n_out + m), Micci-Barreca 2001). A row
    * never sees its own fold's target values, so the encoding can be
    * joined back without train-time leakage.
    *
    * Folds are a deterministic LCG over `idCol` (partitioning-
    * invariant, replayable in SQL). Scale shape: ONE (category, fold)
    * hash agg — map-side combined, O(|C|·K) output — then a keyed
    * window over that tiny frame for the category totals and a 1-row
    * global aggregate broadcast-crossJoined back for the prior μ (NOT
    * an unpartitioned window, which would be a single-partition
    * Exchange — a one-reducer stage for a user-id-like categorical);
    * the cell frame is cached (lazily) so both branches share one
    * corpus scan. The encoding table broadcasts
    * back to the corpus as a map-side join. Output: one row per
    * (category, fold) — n_in, n_out, oof_mean (r15-stabilized).
    */
  def oofTargetEncoding(df: DataFrame, catCol: String, idCol: String,
                        targetCol: String, k: Int, m: Double): DataFrame = {
    require(k >= 2 && m >= 0.0)
    val fold = pmod((col(idCol) * 1103515245L + 12345L) % 2147483648L,
      lit(k.toLong))
    // the target stays in its EXACT type (decimal/int) through every
    // sum — double sums are accumulation-order-dependent and would
    // diverge across engines; only the final ratio goes to double
    // EAGER localCheckpoint of the cell frame (O(|C|·K) rows): the
    // totals branch and the main branch both read it — without staging
    // Spark re-runs the corpus agg per branch (exchange reuse does not
    // cross the broadcast boundary, verified empirically on Spark 4.1).
    // localCheckpoint (not persist): its blocks are reclaimed by the
    // ContextCleaner once the frame is unreferenced, whereas a persist
    // here leaked one cache entry per invocation for the whole session.
    // Contract: the corpus agg executes NOW, not at first action.
    val cells = df.where(col(targetCol).isNotNull)
      .withColumn("fold", fold)
      .groupBy(col(catCol), col("fold"))
      .agg(count(lit(1)).as("n_in"), sum(col(targetCol)).as("_s_in"))
      .localCheckpoint(true)
    val catW = Window.partitionBy(col(catCol))
    val totals = cells.agg(sum(col("_s_in")).as("_s_all"),
      sum(col("n_in")).as("_n_all"))
    cells.crossJoin(broadcast(totals))
      .withColumn("_s_cat", sum(col("_s_in")).over(catW))
      .withColumn("_n_cat", sum(col("n_in")).over(catW))
      .withColumn("_mu",
        col("_s_all").cast("double") / col("_n_all").cast("double"))
      .withColumn("n_out", col("_n_cat") - col("n_in"))
      .withColumn("oof_mean", graft.functions.NumFns.stableRound(
        ((col("_s_cat") - col("_s_in")).cast("double") + lit(m) * col("_mu")) /
          (col("n_out").cast("double") + lit(m)), 6))
      .select(col(catCol), col("fold"), col("n_in"), col("n_out"), col("oof_mean"))
  }

  /** Hashing-trick vectorizer (Weinberger et al. 2009): every token is
    * mapped to one of `numFeatures` slots by a polynomial character
    * hash, with a ±1 sign from the next hash bit so collisions cancel
    * in expectation — the vocabulary-free featurizer that needs NO
    * fitted state, which is exactly why it scales: zero joins, zero
    * broadcast, one (doc, slot) hash agg over the token stream.
    *
    * The hash is h = fold(chars, h·31 + code mod 2^31) — plain exact
    * integer arithmetic any engine replays bit-for-bit (unlike
    * murmur/xxhash, which would make the oracle engine-specific).
    * Output: one row per (doc, non-empty slot) — `value` (signed
    * count) and `n_terms` (unsigned).
    */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  numFeatures: Int): DataFrame = {
    require(numFeatures > 0)
    val tok = docs.where(col(textCol).isNotNull)
      .select(col(idCol),
        explode(graft.functions.TextFns.tokens(col(textCol))).as("w"))
      // split("") walks the token once; positional substr would re-scan
      // the UTF-8 bytes per character (see Curation.charEntropy)
      .withColumn("_h", aggregate(
        transform(split(col("w"), ""), ch => ascii(ch)),
        lit(0L), (acc, c) => (acc * 31L + c) % 2147483648L))
    tok
      .withColumn("slot", pmod(col("_h"), lit(numFeatures.toLong)))
      .withColumn("_sign",
        lit(1L) - lit(2L) * pmod(expr(s"_h DIV $numFeatures"), lit(2L)))
      .groupBy(col(idCol), col("slot"))
      .agg(sum(col("_sign")).as("value"), count(lit(1)).as("n_terms"))
  }
}
