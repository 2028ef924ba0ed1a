package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the leakage gate every serious training
  * pipeline runs before a model ships: a training document that shares
  * a long-enough word n-gram with an evaluation/benchmark document is
  * contaminated (the model would be graded on text it memorized), so
  * it must be flagged and dropped/cleaned. This is the GPT-3/PaLM-
  * style exact n-gram formulation (13-grams there; configurable here —
  * the n-gram length IS the precision/recall dial).
  *
  * Scale shape: the EVAL side is tiny by nature (benchmarks are
  * thousands of documents against a 100 TB corpus), so its distinct
  * gram set builds once and BROADCASTS; the train side is one
  * tokenize+slide pass and a map-side-combined count per doc — no
  * shuffle of the corpus, no all-pairs anything. At a truly huge eval
  * suite the broadcast degrades gracefully to a shuffled semi-join on
  * the gram hash.
  */
object Decontam {

  /** Word n-grams of `textCol`, one row per gram POSITION (duplicates
    * kept — the hit count is per occurrence).
    */
  private def grams(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(col(idCol), TextFns.tokens(col(textCol)).as("_t"))
      .where(size(col("_t")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("_t")) - (n - 1)),
        i => array_join(slice(col("_t"), i, lit(n)), " "))).as("gram"))

  /** Per-train-document contamination counts against the eval corpus:
    * (idCol, n_hits = contaminated gram positions, n_grams = distinct
    * contaminated grams). Documents with zero hits are absent — the
    * clean majority costs nothing downstream.
    */
  def ngramHits(train: DataFrame, evalSet: DataFrame,
                idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"decontamination n-gram must be >= 2, got $n")
    val evalGrams = grams(evalSet, idCol, textCol, n)
      .select(col("gram")).distinct()
    grams(train, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        count_distinct(col("gram")).as("n_grams"))
  }
}
