package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native TF-IDF (no MLlib hashing — exact terms, oracle-reproducible):
  * tf per (doc, token) via explode + hash aggregate, document frequency
  * per token, idf = ln((N+1)/(df+1)) + 1 (smoothed), scored and ranked
  * per document.
  *
  * Scale shape: two hash shuffles (doc,token then token), the corpus
  * size N is a 1-row broadcast cross join, ranking is a window over the
  * (doc) partition. No driver-side collect.
  */
object TfIdf {

  /** Per-(doc, token) TF-IDF scores. Output: doc_id, token, tf, tfidf. */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"), explode(col("_toks")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
      .select(col("doc_id"), col("token"), col("tf"), col("tfidf"))
  }

  /** Top-k tokens per document by TF-IDF (ties broken by token asc). */
  def topK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
    scores(docs, idCol, textCol)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** BM25 ranked retrieval for a small literal term set (the classic
    * lexical-search scorer; Robertson/Sparck-Jones idf with +1
    * smoothing inside the log so idf stays positive).
    *
    * Scale shape: per-(doc, term) term frequency is computed INSIDE the
    * row (explode the ≤|terms| literals against the staged token array
    * — no corpus shuffle at all); document frequency is an O(|terms|)
    * aggregate broadcast back; N/avgdl a 1-row broadcast. avgdl is
    * exact-long SUM / COUNT (order-independent), every score is pure
    * per-row IEEE arithmetic, and only the ≤|terms|-wide per-doc score
    * sum needs stabilization. The final top-k is a
    * TakeOrderedAndProject on the deterministic (score desc, doc_id)
    * order — never a global sort.
    *
    * At 100 TB with a large query workload: stage the tokenized
    * (doc_id, dl, term, tf) table once (ViewStore) instead of the three
    * scans this one-shot form pays, and search per-query over it.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val d = docs
      .where(col(textCol).isNotNull) // null text is unsearchable, not dl=0
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"), col("_toks"),
        size(col("_toks")).cast("long").as("dl"))
    // exact: SUM(long)/COUNT — no double accumulation to stabilize
    val stats = d.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    val tf = d
      .select(col("doc_id"), col("dl"), col("_toks"),
        explode(typedlit(terms)).as("token"))
      .withColumn("tf", size(filter(col("_toks"), x => x === col("token"))).cast("long"))
      .where(col("tf") > 0)
      .drop("_toks")
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("score_t",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(graft.functions.NumFns.stableRound(sum(col("score_t")), 8).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** PMI term co-occurrence: for the top-`vocabSize` corpus terms (by
    * document frequency, ties by token), every within-document pair
    * seen in >= `minPairCount` docs, scored
    * pmi = ln(c_ab * N / (c_a * c_b)) — the collocation / topic-pair
    * signal of corpus analysis.
    *
    * Scale shape: presence (distinct terms per doc) is one (doc, token)
    * hash agg; the vocabulary cut is an O(vocab) TakeOrderedAndProject
    * broadcast back, so the pair self-join on doc_id is bounded by
    * vocabSize per document (never the raw doc length); pair counts are
    * one more hash agg. N and the per-term counts ride broadcasts. The
    * ln argument is an exact small-integer ratio, so scores are
    * bit-equal cross-engine before the r15 belt.
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               vocabSize: Int, minPairCount: Long): DataFrame = {
    val pres = docs
      .where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"), explode(array_distinct(col("_toks"))).as("token"))
    val dfreq = pres.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val vocab = dfreq.orderBy(col("c").desc, col("token")).limit(vocabSize)
    val ft = pres.join(broadcast(vocab), Seq("token"))
    val n = ft.agg(countDistinct(col("doc_id")).as("n"))
    val pairs = ft.select(col("doc_id"), col("token").as("t1"), col("c").as("c1"))
      .join(ft.select(col("doc_id"), col("token").as("t2"), col("c").as("c2")),
        Seq("doc_id"))
      .where(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("c_ab"), first(col("c1")).as("c_a"),
        first(col("c2")).as("c_b"))
      .where(col("c_ab") >= minPairCount)
    pairs.crossJoin(broadcast(n))
      .select(col("t1"), col("t2"), col("c_ab"), col("c_a"), col("c_b"),
        graft.functions.NumFns.stableRound(
          log(col("c_ab").cast("double") * col("n") /
            (col("c_a").cast("double") * col("c_b"))), 6).as("pmi"))
  }

  /** One BPE-training iteration's pair statistics: corpus-wide counts
    * of adjacent character-pair symbols, weighted by word frequency —
    * the distributed heavy step of byte-pair-encoding tokenizer
    * training. The merge loop itself is O(vocab) driver work applied
    * to THIS table's argmax each round; counting is the job that has
    * to scale.
    *
    * Scale shape: the corpus collapses to the distinct-word frequency
    * table first (one (word) hash agg, map-side combined — Zipf makes
    * |vocab| tiny vs corpus tokens), so the pair explode runs over
    * |vocab| rows, never the raw corpus. The top-k cut is a
    * TakeOrderedAndProject on (n desc, pair) — deterministic, never a
    * global sort. Single-char words carry no pairs and are dropped
    * before the explode (also keeps `sequence(1, length-1)` away from
    * its descending-default trap at length 1).
    */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .where(length(col("w")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)

  /** Skip-gram training-pair generation (word2vec-style): for every
    * token, one (center, context) pair per neighbor within ±`window`
    * positions, counted corpus-wide and cut at `minCount` — the
    * embedding-training co-occurrence feed (and the raw input PMI
    * weighting refines). Pairs are DIRECTED ((a,b) and (b,a) count
    * separately, as in word2vec's corpus scan).
    *
    * Scale shape: pairs expand INSIDE the row (≤ 2·window per token —
    * a flat transform, no join), then one (center, context) hash agg,
    * map-side combined. Nothing corpus-sized shuffles twice.
    */
  def skipGramPairs(docs: DataFrame, textCol: String, window: Int = 2,
                    minCount: Long = 5L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    docs.where(col(textCol).isNotNull)
      .select(TextFns.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(_toks, (c, i) ->
           transform(
             filter(sequence(greatest(0, i - $window),
                             least(size(_toks) - 1, i + $window)),
                    j -> j != i),
             j -> struct(c AS center, _toks[j] AS context))))""")).as("p"))
      .select(col("p.center"), col("p.context"))
      .groupBy(col("center"), col("context")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai/Lafferty) —
    * the probabilistic-LM counterpart of [[bm25]], and the second
    * ranker a hybrid-retrieval stack fuses with it:
    * score(d) = Σ_t ln((tf_td + μ·cf_t/|C|) / (dl_d + μ)), over docs
    * matching ≥1 term (absent terms still contribute the background
    * probability; terms absent from the whole corpus would score -inf
    * — callers pass corpus terms, as with bm25).
    *
    * Scale shape mirrors bm25: tf is computed inside the row against
    * the staged token array (explode of ≤|terms| literals — no corpus
    * shuffle); collection stats (cf_t, |C|) are exact-long O(|terms|)
    * broadcasts; only the ≤|terms|-wide per-doc sum needs r15
    * stabilization; the cut is a TakeOrderedAndProject on
    * (score desc, doc_id).
    */
  def queryLikelihood(docs: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String], mu: Double = 300.0,
                      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "queryLikelihood needs at least one term")
    val d = docs.where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"), col("_toks"),
        size(col("_toks")).cast("long").as("dl"))
    val perTerm = d
      .select(col("doc_id"), col("dl"), explode(typedlit(terms)).as("token"),
        col("_toks"))
      .withColumn("tf",
        size(filter(col("_toks"), x => x === col("token"))).cast("long"))
      .drop("_toks")
    val coll = perTerm.groupBy(col("token")).agg(sum(col("tf")).as("cf"))
    val totals = d.agg(sum(col("dl")).as("clen"))
    perTerm.join(broadcast(coll), Seq("token"))
      .crossJoin(broadcast(totals))
      .withColumn("score_t", log(
        (col("tf").cast("double") +
          lit(mu) * col("cf").cast("double") / col("clen").cast("double")) /
          (col("dl").cast("double") + lit(mu))))
      .groupBy(col("doc_id"))
      .agg(graft.functions.NumFns.stableRound(sum(col("score_t")), 8).as("score"),
        max(col("tf")).as("_mx"))
      .where(col("_mx") > 0)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of retriever
    * rankings: fused(d) = Σ_lists 1/(k + rank_d), summed over the
    * lists that retrieved d. The standard way to combine lexical and
    * semantic retrieval without score calibration.
    *
    * Each input is a (doc_id, score) frame ALREADY cut to its own
    * bounded top-k, and each list ranks within ITS OWN window
    * partition (the lists union first, tagged by list index, so one
    * hash-partitioned window ranks all of them — no single-partition
    * exchange anywhere, even structurally). That is the 100 TB
    * contract: retrievers prune, fusion is O(Σ list sizes). Ranks are
    * deterministic (score desc, doc_id); the fused sum is
    * r15-stabilized.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val w = Window.partitionBy(col("_list"))
      .orderBy(col("score").desc, col("doc_id"))
    rankings.zipWithIndex.map { case (r, i) =>
        r.select(col("doc_id"), col("score")).withColumn("_list", lit(i))
      }
      .reduce(_ unionByName _)
      .withColumn("rank", row_number().over(w).cast("long"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.NumFns.stableRound(
          sum(lit(1.0) / (lit(k.toDouble) + col("rank"))), 12).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** Vocabulary pruning + per-document OOV rate: the vocabulary is the
    * top `vocabSize` tokens by corpus frequency (ties by token — fully
    * deterministic), and every document reports how much of it falls
    * outside that vocabulary — the coverage check run before freezing
    * a tokenizer.
    *
    * Scale shape: ONE corpus scan. The tokenize+explode aggregates to
    * per-document token counts (id, w, c) and materializes ONCE
    * (localCheckpoint — the jaccardPrefixJoin precedent); both
    * consumers read that frame instead of re-tokenizing the corpus:
    * the vocabulary is a (token) re-agg + global sort LIMIT, which
    * Spark executes as TakeOrderedAndProject — per-partition top-K
    * then a K-sized driver merge, never a full sort (the scalable
    * alternative to ranking the vocabulary through a single-partition
    * window) — and scoring is one map-side membership probe + one
    * doc-keyed agg over the same frame. `oov_rate` is a single
    * long/long division — bit-stable cross-engine.
    *
    * EAGER-EXECUTION CONTRACT: the checkpoint runs the full
    * tokenize+agg at DataFrame-construction time (not at first
    * action), and the checkpointed blocks persist for the session —
    * callers that only want the plan shape should not call this.
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize > 0)
    val perDoc = docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    val vocab = perDoc.groupBy(col("w")).agg(sum(col("_c")).as("_n"))
      .orderBy(col("_n").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(true).as("_in"))
    perDoc.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_toks"),
        sum(when(col("_in").isNull, col("_c")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_toks").cast("double"))
  }
}
