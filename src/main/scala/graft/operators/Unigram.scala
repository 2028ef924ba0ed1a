package graft.operators

import graft.functions.{NumFns, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer TRAINING — the
  * tokenizer family BPE ([[Bpe]]) doesn't cover and the one most LLM
  * pipelines actually ship. Deterministic hard-EM over the
  * distinct-word table:
  *
  *  - SEED: all substrings up to `maxLen` chars of the distinct-word
  *    table, weighted by word frequency (one hash agg over the
  *    Zipf-collapsed vocab table, never the raw corpus); the top
  *    `seedSize` by count plus every single character (coverage: any
  *    word must remain segmentable).
  *  - E-STEP: Viterbi-segment every distinct word under the current
  *    piece log-probs — ONE codegen'd projection per round: the DP over
  *    character positions is a per-row `aggregate` fold (each position
  *    maximizes over its ≤ maxLen predecessors; ties break to the
  *    longest piece via strict-improvement scanning), followed by a
  *    backpointer walk, also a fold. The vocab rides along as a map
  *    LITERAL (O(vocab) driver state — a model parameter, exactly like
  *    [[Bpe]]'s merge pairs or KMeans centroids).
  *  - M-STEP: piece counts from the best segmentations (one hash agg,
  *    exact longs), pruned to the top `vocabSize` (count desc, piece) —
  *    single characters always retained — and re-scored with add-one
  *    smoothing: lp = r9(ln(cnt + 1) − ln(tot + |V|)). The 9-digit
  *    stableRound is what makes the whole EM trajectory — every DP
  *    comparison included — replay bit-for-bit in the SQL oracle: DP
  *    path sums add identical rounded doubles in identical order in
  *    both engines.
  *
  * Scale shape: every stage is a bounded hash agg or a shuffle-free
  * projection over the distinct-word table; the only driver state is
  * the O(vocabSize) vocab between rounds. At extreme vocab the literal
  * map lookup (linear per probe) becomes a broadcast join against a
  * span table — same plan shape, same semantics.
  */
object Unigram {

  /** Distinct-word frequency table of the corpus: (word, freq). */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** All substrings of length <= maxLen, weighted by word freq
    * (overlapping occurrences all count): (piece, cnt).
    */
  def substringCounts(words: DataFrame, maxLen: Int): DataFrame =
    words.select(col("freq"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), i -> " +
          s"transform(sequence(i, least(length(word), i + ${maxLen - 1})), " +
          s"j -> substring(word, i, j - i + 1))))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Seed vocabulary: top `seedSize` substrings by (cnt desc, piece)
    * plus every single character. (piece, cnt).
    */
  def seedVocab(words: DataFrame, maxLen: Int, seedSize: Int): DataFrame = {
    val subs = substringCounts(words, maxLen).localCheckpoint()
    subs.orderBy(col("cnt").desc, col("piece")).limit(seedSize)
      .unionByName(subs.where(length(col("piece")) === 1))
      .dropDuplicates("piece")
  }

  /** Add-one-smoothed log-probs over a (piece, cnt) vocab:
    * (piece, cnt, lp) with lp = r9(ln(cnt + 1) − ln(tot + |V|)).
    * The one-row totals broadcast (explicitly — plan shape must not
    * depend on AQE).
    */
  def withLogProbs(vocab: DataFrame): DataFrame = {
    val totals = vocab.agg(sum(col("cnt")).as("_tot"),
      count(lit(1)).as("_nv"))
    vocab.crossJoin(broadcast(totals))
      .select(col("piece"), col("cnt"),
        NumFns.stableRound(
          log(col("cnt").cast("double") + lit(1.0)) -
            log(col("_tot").cast("double") + col("_nv").cast("double")),
          9).as("lp"))
  }

  /** DP + backpointer-walk expressions, parameterized by the log-prob
    * lookup fragment `lp(j, i)` for the piece word[j..i) — shared by
    * the literal-map and span-table segmenters so their semantics
    * cannot drift.
    */
  private def viterbiExprs(maxLen: Int, lp: String): (String, String) = {
    val dpExpr =
      s"""aggregate(sequence(1, length(word)),
           array(named_struct('s', 0.0D, 'j', -1, 'p', '')),
           (acc, i) -> concat(acc, array(
             aggregate(sequence(greatest(0, i - $maxLen), i - 1),
               named_struct('s', -1.0E18D, 'j', -1, 'p', ''),
               (m, j) -> if(($lp) is not null
                            and acc[j].s + ($lp) > m.s,
                          named_struct(
                            's', acc[j].s + ($lp),
                            'j', j,
                            'p', substring(word, j + 1, i - j)),
                          m)))))"""
    // a word with NO viable segmentation (a character outside the
    // vocab — possible when a trained vocab is applied to a corpus
    // with unseen characters) leaves the final DP cell at the
    // -1e18/j=-1 sentinel; emit null pieces so callers can DETECT the
    // coverage gap instead of silently counting [""] pieces. Guarding
    // the final cell suffices: a reachable final cell's backpointer
    // chain only visits reachable cells (its score is finite only if
    // every predecessor on the path is).
    val walkExpr =
      s"""if(length(word) > 0 and _dp[length(word)].j = -1,
           cast(null as array<string>),
           aggregate(sequence(1, length(word)),
             named_struct('pos', length(word), 'ps', cast(array() as array<string>)),
             (st, x) -> if(st.pos <= 0, st,
               named_struct('pos', _dp[st.pos].j,
                            'ps', concat(array(_dp[st.pos].p), st.ps)))).ps)"""
    (dpExpr, walkExpr)
  }

  /** Viterbi-segment each word of `words` under the piece log-probs:
    * adds a `pieces` array<string> column. The DP and the backpointer
    * walk are single codegen'd folds; ties in the position argmax break
    * to the smallest start (= longest piece), by strict-improvement
    * scanning in ascending start order.
    */
  def segment(words: DataFrame, vocab: Map[String, Double],
              maxLen: Int): DataFrame = {
    val (dpExpr, walkExpr) =
      viterbiExprs(maxLen, "element_at(_vm, substring(word, j + 1, i - j))")
    words
      .withColumn("_vm", typedLit(vocab))
      .withColumn("_dp", expr(dpExpr))
      .withColumn("pieces", expr(walkExpr))
      .drop("_vm", "_dp")
  }

  /** Span radix for [[segmentJoin]]'s per-word span map keys
    * (j * radix + i): words must be shorter than this. */
  private val SpanRadix = 1 << 20

  /** [[segment]] at EXTREME vocabulary scale, where an O(|V|) literal
    * map per task is no longer a model parameter: the vocab stays a
    * DataFrame, candidate spans explode per word and broadcast-join
    * the vocab (piece equi-key), and each word folds over its own
    * per-row span→lp map. One added word-keyed aggregation versus the
    * literal-map path; the DP and walk are the SAME shared expressions,
    * and the spec pins the two segmenters piece-for-piece equal.
    */
  def segmentJoin(words: DataFrame, vocab: DataFrame,
                  maxLen: Int): DataFrame = {
    val spans = words.select(col("word"), explode(expr(
        s"flatten(transform(sequence(0, length(word) - 1), j -> " +
          s"transform(sequence(j + 1, least(length(word), j + $maxLen)), " +
          s"i -> named_struct('j', j, 'i', i, " +
          s"'p', substring(word, j + 1, i - j)))))")).as("sp"))
      .select(col("word"), col("sp.j"), col("sp.i"), col("sp.p").as("piece"))
      .join(broadcast(vocab.select(col("piece"), col("lp"))), Seq("piece"))
      .groupBy(col("word"))
      .agg(map_from_entries(collect_list(struct(
        (col("j").cast("long") * SpanRadix + col("i")).as("k"),
        col("lp").as("v")))).as("_sm"))
    val (dpExpr, walkExpr) =
      viterbiExprs(maxLen, s"element_at(_sm, cast(j as bigint) * $SpanRadix + i)")
    words.join(spans, Seq("word"), "left")
      .withColumn("_dp", expr(dpExpr))
      .withColumn("pieces", expr(walkExpr))
      .drop("_sm", "_dp")
  }

  /** Piece counts of the corpus under a segmentation: (piece, cnt),
    * weighted by word frequency. Exact longs — the cross-engine-stable
    * EM statistic.
    */
  def pieceCounts(segmented: DataFrame): DataFrame =
    segmented.select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Train the unigram vocab: seed, then `emRounds` of Viterbi E-step +
    * count/prune/re-score M-step. Returns the final (piece, cnt, lp)
    * table — the tokenizer artifact.
    */
  def train(docs: DataFrame, textCol: String, maxLen: Int = 4,
            seedSize: Int = 150, vocabSize: Int = 80,
            emRounds: Int = 2): DataFrame = {
    val words = wordTable(docs, textCol).localCheckpoint()
    val chars = words.select(col("freq"),
        explode(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          .as("piece"))
      .select(col("piece")).distinct().localCheckpoint()
    var vocab = withLogProbs(seedVocab(words, maxLen, seedSize))
    for (_ <- 1 to emRounds) {
      val vm = collectVocab(vocab)
      val counts = pieceCounts(segment(words, vm, maxLen)).localCheckpoint()
      val kept = counts.orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
        .unionByName(chars
          .join(counts, Seq("piece"), "left")
          .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt")))
        .dropDuplicates("piece")
      vocab = withLogProbs(kept)
    }
    vocab
  }

  /** Collect a (piece, _, lp) vocab frame to the driver map the
    * segmenter folds over — O(vocabSize) rows, a model parameter.
    */
  def collectVocab(vocab: DataFrame): Map[String, Double] =
    vocab.select(col("piece"), col("lp")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Tokenizer APPLY: segment the corpus' distinct words with a trained
    * vocab and count final pieces corpus-wide — (piece, n).
    */
  def tokenCounts(docs: DataFrame, textCol: String,
                  vocab: Map[String, Double], maxLen: Int = 4): DataFrame =
    pieceCounts(segment(wordTable(docs, textCol), vocab, maxLen))
      .select(col("piece"), col("cnt").as("n"))

  /** Per-group tokenizer FERTILITY — the quality metric a multilingual
    * tokenizer is judged by (pieces per word, chars per piece; a
    * language the vocab under-serves shows high fertility): segment
    * the distinct-word table ONCE, then join the per-word piece count
    * back onto the (group, word) frequency table and aggregate. The DP
    * never runs per group — Zipf collapse first, group weighting
    * after. Exact-long sums; the two ratios are single int-derived
    * divisions, cross-engine stable raw.
    */
  def fertility(docs: DataFrame, textCol: String, groupCol: String,
                vocab: Map[String, Double], maxLen: Int = 4): DataFrame = {
    val byGroup = docs.where(col(textCol).isNotNull)
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col(groupCol), col("word")).agg(count(lit(1)).as("freq"))
    val perWord = segment(
        byGroup.select(col("word")).distinct(), vocab, maxLen)
      .select(col("word"), size(col("pieces")).cast("long").as("_np"))
    byGroup.join(perWord, Seq("word"))
      .groupBy(col(groupCol))
      .agg(sum(col("freq")).as("n_words"),
        sum(col("freq") * col("_np")).as("n_pieces"),
        sum(col("freq") * length(col("word"))).as("n_chars"))
      .withColumn("pieces_per_word",
        col("n_pieces").cast("double") / col("n_words"))
      .withColumn("chars_per_piece",
        col("n_chars").cast("double") / col("n_pieces"))
  }
}
