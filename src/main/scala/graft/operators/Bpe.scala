package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich et al. 2016) — the full iterate
  * count → merge-top-pair → re-segment loop, not just one pair-count
  * round ([[TfIdf.bpePairCounts]]). The structure that makes it a
  * Spark job instead of a driver loop over raw text:
  *
  *  - the corpus collapses ONCE to the distinct-word frequency table
  *    (Zipf: |vocab| ≪ corpus tokens) segmented into character
  *    symbols; every training round runs over that table only — the
  *    raw corpus is never re-tokenized;
  *  - each round is ONE hash aggregate over the vocab table (adjacent
  *    symbol pairs weighted by word frequency, map-side combined), a
  *    bounded top-1 (TakeOrderedAndProject on (n desc, pair) —
  *    deterministic ties, never a global sort), and one codegen'd
  *    projection applying the merge as a left-to-right non-overlapping
  *    fold over each word's symbol array;
  *  - the winning pair is the only thing that touches the driver per
  *    round (O(1) rows — a model parameter, like KMeans centroids),
  *    and it re-enters the plan as two literals;
  *  - `localCheckpoint` truncates the per-round lineage so `rounds`
  *    stays O(1) plan depth instead of stacking `rounds` nested
  *    projections.
  *
  * At 100 TB the vocab table for a web corpus is ~10^8 rows — each
  * round stays one bounded shuffle + one projection; the merge table
  * (the trained tokenizer) is vocab-sized and broadcastable.
  */
object Bpe {

  /** The distinct-word frequency table segmented into single-character
    * start symbols: (word, freq, s: array<string>).
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("s", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** One merge applied to a symbol array: left-to-right non-overlapping
    * replacement of adjacent (p1, p2) by the concatenated symbol — the
    * exact reference-BPE scan, expressed as a fold (a just-merged
    * element is `p1 ++ p2`, which never equals `p1`, so the fold cannot
    * re-consume it: "aaa" + (a,a) → [aa, a], not [aa, aa]).
    */
  private def applyMerge(s: org.apache.spark.sql.Column, p1: String, p2: String) =
    aggregate(s, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(p1) && x === lit(p2),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(p1 + p2))))
        .otherwise(concat(acc, array(x))))

  /** Train `rounds` BPE merges over the corpus. Returns the learned
    * merge table — (round, p1, p2, n): the pair merged in each round
    * and its weighted count — which IS the tokenizer artifact a
    * trainer ships. Stops early if no adjacent pair remains.
    */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = words.where(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(s) - 1)," +
            " i -> struct(element_at(s, i) AS p1, element_at(s, i + 1) AS p2))")).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("p1"), col("p2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (p1, p2, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, p1, p2, n))
        words = words.withColumn("s", applyMerge(col("s"), p1, p2))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq.toDF("round", "p1", "p2", "n")
  }

  /** Segment the corpus' words with an already-trained merge table
    * (the inference half: apply the merges in round order to the
    * distinct-word table, then count final symbols corpus-wide).
    * Returns (symbol, n) — the trained subword vocabulary with
    * corpus frequencies.
    */
  def symbolVocab(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = merges.foldLeft(wordTable(docs, textCol)) {
      case (w, (p1, p2)) => w.withColumn("s", applyMerge(col("s"), p1, p2))
    }
    words.select(col("freq"), explode(col("s")).as("symbol"))
      .groupBy(col("symbol")).agg(sum(col("freq")).as("n"))
  }
}
