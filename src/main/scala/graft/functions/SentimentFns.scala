package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic lexicon-based 3-class sentiment scorer.
  *
  * Capability parity with the reference's FinBERT stage (reference:
  * airflow/dags/Batch_layer/batchPipeline.py:142-147,
  * Speed_layer/twitterConsumerStream.py:61-66): per-document
  * (positive, negative, neutral) scores in [0,1] summing to 1. No
  * transformer model is available offline, so the default scorer is a
  * Loughran–McDonald-style word-list count with Laplace smoothing:
  *
  *   pos = (|pos hits| + 1) / (|tokens| + 3)
  *   neg = (|neg hits| + 1) / (|tokens| + 3)
  *   neu = (|tokens| - |pos| - |neg| + 1) / (|tokens| + 3)
  *
  * Integer counts + one double division => bit-identical across engines,
  * which keeps the DuckDB oracle exact. Pure column expressions — fully
  * codegen'd, no UDF.
  */
object SentimentFns {

  /** Financial-positive markers (Loughran–McDonald flavor, trimmed). */
  val DefaultPositive: Seq[String] = Seq(
    "fast", "big", "spark", "vector", "gain", "growth", "profit", "beat",
    "strong", "up", "surge", "rally", "record", "win")

  /** Financial-negative markers. */
  val DefaultNegative: Seq[String] = Seq(
    "slow", "small", "dup", "scan", "loss", "drop", "miss", "weak",
    "down", "fall", "risk", "fraud", "decline", "crash")

  /** Staged per-row scorer: adds (posCol, negCol, neuCol) to `df`,
    * tokenizing once via intermediate columns (the struct form below
    * inlines the tokenization into each consumer expression). Identical
    * arithmetic to `sentiment` — oracle-compatible.
    */
  def withSentiment(df: DataFrame, textCol: String,
                    posCol: String = "pos", negCol: String = "neg", neuCol: String = "neu",
                    positive: Seq[String] = DefaultPositive,
                    negative: Seq[String] = DefaultNegative): DataFrame =
    df.withColumn("_sent_toks", TextFns.tokens(col(textCol)))
      .withColumn("_sent_n", size(col("_sent_toks")).cast("double"))
      .withColumn("_sent_pc",
        size(filter(col("_sent_toks"), t => t.isInCollection(positive))).cast("double"))
      .withColumn("_sent_nc",
        size(filter(col("_sent_toks"), t => t.isInCollection(negative))).cast("double"))
      .withColumn(posCol, (col("_sent_pc") + lit(1.0)) / (col("_sent_n") + lit(3.0)))
      .withColumn(negCol, (col("_sent_nc") + lit(1.0)) / (col("_sent_n") + lit(3.0)))
      .withColumn(neuCol,
        (col("_sent_n") - col("_sent_pc") - col("_sent_nc") + lit(1.0)) / (col("_sent_n") + lit(3.0)))
      .drop("_sent_toks", "_sent_n", "_sent_pc", "_sent_nc")

  /** Lexicon-join scorer: the scale path for lexicons too large to inline
    * as IN-lists (SURVEY §4's "dictionary join" note). Tokens explode and
    * join a broadcast lexicon table (word, polarity), counts re-aggregate
    * per doc. Same smoothing arithmetic as `sentiment`/`withSentiment` —
    * results are identical for the same lexicon.
    *
    * @param lexicon (word, polarity) rows with polarity in {"pos","neg"}
    * @param idCol   unique row id to re-join counts on
    */
  def withSentimentLexiconJoin(df: DataFrame, idCol: String, textCol: String,
                               lexicon: DataFrame,
                               posCol: String = "pos", negCol: String = "neg",
                               neuCol: String = "neu"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // tokens staged below the explode (interpreted-HOF clone trap —
    // see graft.Tuning)
    val toks = df.withColumn("_stoks", TextFns.tokens(col(textCol)))
      .select(col(idCol).as("_sid"), explode(col("_stoks")).as("word"))
    // token count BEFORE the lexicon join: a word listed under multiple
    // polarities fans the join out and would inflate _n; hits join a
    // (word, polarity)-deduped lexicon so each polarity counts once per
    // occurrence (matching the inline scorer's independent IN-lists)
    val nPerDoc = toks.groupBy(col("_sid"))
      .agg(count(lit(1)).cast("double").as("_n"))
    val counts = toks
      .join(broadcast(lexicon.dropDuplicates("word", "polarity")), Seq("word"), "left")
      .groupBy(col("_sid"))
      .agg(count(when(col("polarity") === "pos", 1)).cast("double").as("_pc"),
        count(when(col("polarity") === "neg", 1)).cast("double").as("_nc"))
      .join(nPerDoc, Seq("_sid"))
    // coalesce-to-0 covers rows whose text produced no tokens (empty
    // string => scores 1/3 like the inline scorer), but must NOT fire for
    // null text: the inline scorer propagates null there, so the score
    // columns are gated on text IS NOT NULL to keep the two scorers
    // identical row-for-row.
    def score(c: Column) = when(col(textCol).isNull, lit(null).cast("double")).otherwise(c)
    df.join(counts, df(idCol) === counts("_sid"), "left")
      .withColumn("_n", coalesce(col("_n"), lit(0.0)))
      .withColumn("_pc", coalesce(col("_pc"), lit(0.0)))
      .withColumn("_nc", coalesce(col("_nc"), lit(0.0)))
      .withColumn(posCol, score((col("_pc") + lit(1.0)) / (col("_n") + lit(3.0))))
      .withColumn(negCol, score((col("_nc") + lit(1.0)) / (col("_n") + lit(3.0))))
      .withColumn(neuCol,
        score((col("_n") - col("_pc") - col("_nc") + lit(1.0)) / (col("_n") + lit(3.0))))
      .drop("_sid", "_n", "_pc", "_nc")
  }

  /** (pos, neg, neu) scores as a 3-field struct column. */
  def sentiment(text: Column,
                positive: Seq[String] = DefaultPositive,
                negative: Seq[String] = DefaultNegative): Column = {
    val toks = TextFns.tokens(text)
    val n = size(toks).cast("double")
    val pc = size(filter(toks, t => t.isInCollection(positive))).cast("double")
    val nc = size(filter(toks, t => t.isInCollection(negative))).cast("double")
    val denom = n + lit(3.0)
    struct(
      ((pc + lit(1.0)) / denom).as("pos"),
      ((nc + lit(1.0)) / denom).as("neg"),
      ((n - pc - nc + lit(1.0)) / denom).as("neu"))
  }
}
