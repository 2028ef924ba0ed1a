package graft.operators

import graft.functions.{NumFns, TextFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: Gopher-style repetition/quality metrics
  * and benchmark n-gram decontamination. Both are designed around the
  * 100 TB plan shape — narrow projections, map-side-combinable keyed
  * aggregations, and a broadcast-only benchmark side; nothing here
  * shuffles the corpus against itself.
  */
object Curation {

  /** Per-document repetition/quality metrics (Rae et al. 2021, "Scaling
    * Language Models" §A1.1 shape): token count, top-unigram fraction,
    * duplicate-bigram fraction, mean word length.
    *
    * The mode (top-unigram) frequency is computed the scale way:
    * explode → (id, word) hash-agg (partial/map-side combined) →
    * per-id max — O(n_tokens) work per doc and two keyed shuffles,
    * instead of an O(n_distinct × n_tokens) per-row array scan that
    * goes quadratic on long documents. The array-local stats (bigram
    * dup ratio, char sum) ride the same single projection of the text.
    *
    * All emitted doubles are single int/int divisions — bit-stable
    * across engines, safe to compare raw.
    *
    * Input rows with null text or fewer than 2 tokens are dropped
    * (no bigrams ⇒ the dup ratio is undefined).
    */
  def qualityMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Two branches over the tokenized frame: the mode (explode + two
    // keyed aggs, narrow (id, word) rows) and the array-local stats
    // (one projection), joined on id. Spark executes the scan +
    // tokenize twice (no common-subplan reuse across join inputs) —
    // MEASURED CHEAPER than the single-pass alternative that carries
    // the three stat longs through the exploded shuffle as first()
    // aggregates (warm bench medians at sf0.1: ~1.3 s vs ~5.1 s —
    // widening every exploded row and adding four agg buffers costs
    // more than a second light scan). At real corpus scale,
    // materialize the token table once and feed both branches from it.
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), TextFns.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col(idCol), col("toks"),
        size(col("toks")).cast("long").as("n_words"),
        TextFns.shinglesFromTokens(col("toks"), 2).as("bi"))
      .select(col(idCol), col("toks"), col("n_words"),
        size(col("bi")).cast("long").as("n_bi"),
        size(array_distinct(col("bi"))).cast("long").as("n_dbi"),
        aggregate(col("toks"), lit(0L), (a, x) => a + length(x)).as("n_chars"))
    val top = base.select(col(idCol), explode(col("toks")).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_cnt"))
    base.drop("toks").join(top, Seq(idCol))
      .select(col(idCol), col("n_words"),
        (col("top_cnt").cast("double") / col("n_words")).as("top_unigram_frac"),
        (lit(1.0) - col("n_dbi").cast("double") / col("n_bi")).as("dup_bigram_frac"),
        (col("n_chars").cast("double") / col("n_words")).as("mean_word_len"))
  }

  /** Composite keep gate over [[qualityMetrics]] output. */
  def keepRule(minWords: Long, maxTopFrac: Double, maxDupFrac: Double): Column =
    col("n_words") >= minWords &&
      col("top_unigram_frac") <= maxTopFrac &&
      col("dup_bigram_frac") <= maxDupFrac

  /** Sequence packing (overflow-bin policy): assign documents, in a
    * deterministic order within each shard, to consecutive bins of
    * ~`capacity` tokens — the batch-assembly step that turns a corpus
    * into training sequences. A document is never split; it belongs to
    * the bin where its shard's running token count started, so bins
    * may overflow by at most one document (the standard simple packing
    * policy; first-fit-decreasing trades determinism for tighter bins).
    *
    * Scale shape: packing is sequential BY DESIGN, so it runs per
    * shard — one window partitioned by `shardCol` ordered by `idCol`,
    * a single keyed shuffle, each shard streaming independently.
    * Output: one row per document with its (shard, bin) assignment and
    * token count; bin ids are per-shard.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, capacity: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Long.MinValue, -1)
    docs.where(col(textCol).isNotNull)
      .withColumn("_n_tok", TextFns.tokenCount(col(textCol)))
      .withColumn("bin",
        floor(coalesce(sum(col("_n_tok")).over(w), lit(0L)) / capacity).cast("long"))
      .select(col(idCol), col(shardCol), col("_n_tok").as("n_tokens"), col("bin"))
  }

  /** Benchmark decontamination: per-corpus-document count and fraction
    * of distinct word n-grams that also appear in the benchmark set.
    * Real pipelines use 8–13-grams; `n` is a parameter.
    *
    * `isBench` splits the input into the (tiny) benchmark slice and
    * the corpus. The benchmark's distinct n-grams are broadcast —
    * corpus-side the check is a map-side hash probe plus one
    * doc-keyed agg, never a corpus×corpus shuffle. That is exactly
    * the 100 TB plan: eval n-grams ship to every executor, the crawl
    * streams by once. Only documents with ≥1 hit are emitted.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    isBench: Column, n: Int): DataFrame = {
    // `_toks` is staged as its own projection BELOW the explode.
    // Mechanism (measured 19x at sf0.1, 13.4 s vs 0.7 s): higher-order
    // functions (transform/filter) are CodegenFallback — always
    // interpreted — and when the generator input is an inline
    // expression, InferFiltersFromGenerate clones the WHOLE chain into
    // inferred isnotnull/size filters, which pushdown clones again
    // into the scan's data filters: the interpreted lambda chain runs
    // ~6x per input row (rule exclusion alone: 16 s -> 4.8 s; staging:
    // 0.7 s — one interpreted evaluation per row, and the inferred
    // filters reference the cheap staged attribute instead).
    val grams = docs.where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .select(col(idCol), isBench.as("_bench"),
        explode(array_distinct(TextFns.shinglesFromTokens(col("_toks"), n))).as("g"))
    val bench = grams.where(col("_bench")).select(col("g")).distinct()
    // left join against the broadcast bench grams, then one doc-keyed
    // agg computes total and hit counts together (no second pass for
    // the per-doc gram count)
    grams.where(!col("_bench"))
      .join(broadcast(bench.withColumn("_hit", lit(1))), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("_hit")).as("n_hit"))
      .where(col("n_hit") >= 1)
      .select(col(idCol), col("n_grams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_grams")).as("contam_frac"))
  }

  /** Chunk documents into overlapping ~`chunkTokens`-token windows with
    * `stride` — the splitter every pretraining/RAG pipeline runs before
    * tokenization. Chunk starts are 0, stride, 2·stride, …; the last
    * chunk may be short; a doc shorter than one chunk yields exactly
    * one. Pure per-row projection + one bounded explode (chunks per doc
    * = O(len/stride)) — zero shuffles, the corpus streams by once.
    * Emits (idCol, chunk_id, chunk_text, n_tokens).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride, "need 0 < stride <= chunkTokens")
    val staged = docs.where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .where(size(col("_toks")) > 0)
    // nChunks = 1 + ceil((n - chunk) / stride) for n > chunk, else 1;
    // double division + floor is exact for any realistic doc length
    val n = size(col("_toks"))
    val nChunks = (lit(1) + greatest(lit(0),
      floor((n - chunkTokens + stride - 1).cast("double") / stride))).cast("int")
    staged
      .withColumn("_starts", transform(sequence(lit(0), nChunks - 1), c => c * stride))
      .select(col(idCol), posexplode(col("_starts")).as(Seq("chunk_id", "_start")),
        col("_toks"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("_toks"), col("_start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("_toks")) - col("_start")).cast("long")
          .as("n_tokens"))
  }

  /** Merge overlapping/adjacent [start, end) intervals per key — the
    * island step of span removal, but a first-class relational op in
    * its own right (calendar/occupancy merging). One keyed window pass:
    * an interval starts a new island iff its start exceeds the running
    * max end of everything before it.
    */
  def mergeIntervals(df: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val byStart = W.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val runMax = max(col(endCol)).over(byStart.rowsBetween(W.unboundedPreceding, -1))
    val flagged = df
      .withColumn("_new", when(runMax.isNull || col(startCol) > runMax, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(byStart))
    flagged.groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol))
      .drop("_island")
  }

  /** Remove repeated spans from the LOWER-priority side of each
    * [[Dedup.repeatedSpans]] pair (b_doc; the min-id doc stays intact —
    * the same survivor policy as near-dedup): spans per doc merge via
    * [[mergeIntervals]], then one projection drops the covered token
    * positions. Docs without spans pass through untouched. Emits
    * (idCol, clean_text, n_removed).
    */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                          spans: DataFrame): DataFrame = {
    val merged = mergeIntervals(
      spans.select(col("b_doc").as("_rid"), col("b_start").as("s"),
        (col("b_start") + col("span_toks")).as("e")),
      "_rid", "s", "e")
    val perDoc = merged.groupBy(col("_rid"))
      .agg(collect_list(struct(col("s"), col("e"))).as("_ivs"))
    docs.where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .join(perDoc, col(idCol) === col("_rid"), "left")
      .withColumn("_keep", when(col("_ivs").isNull, col("_toks"))
        .otherwise(filter(col("_toks"), (_, i) =>
          !exists(col("_ivs"), iv => i >= iv.getField("s") && i < iv.getField("e")))))
      .select(col(idCol),
        array_join(col("_keep"), " ").as("clean_text"),
        (size(col("_toks")) - size(col("_keep"))).cast("long").as("n_removed"))
  }

  /** URL/domain curation — the usual FIRST filter of a web-corpus
    * pipeline, before any content-based step touches the text:
    *  1. host extraction from the URL (native `parse_url`, codegen'd);
    *  2. blocklist removal: a broadcast LEFT ANTI join against the host
    *     blocklist (production blocklists run to millions of hosts —
    *     a join against a real table, never an `isin` literal; the
    *     corpus side does not shuffle);
    *  3. per-domain document cap: deterministic exact-k via
    *     [[Mixer.exactKPerGroup]] (LCG rank window, WindowGroupLimit
    *     pushdown) — one keyed shuffle on host, the step that stops a
    *     single crawled domain from dominating the mixture.
    *
    * Emits the surviving rows plus `host`. The only corpus shuffle is
    * the cap's window; at 100 TB both filters are map-side.
    */
  def domainCurate(df: DataFrame, urlCol: String, idCol: String,
                   blockHosts: DataFrame, maxPerDomain: Int): DataFrame = {
    val hosted = df.withColumn("host", parse_url(col(urlCol), lit("HOST")))
    val kept = hosted.join(broadcast(blockHosts), Seq("host"), "left_anti")
    Mixer.exactKPerGroup(kept, "host", idCol, maxPerDomain)
  }

  /** URL canonicalization — the normalization that makes URL-level
    * dedup work (the same page arrives as `HTTPS://WWW.x.ORG:443/a/?b=2&
    * utm_source=feed#top` and `https://x.org/a?b=2`): lowercase scheme
    * and host, strip a leading `www.`, strip default ports (:80/:443),
    * strip trailing path slashes and the fragment, drop tracking
    * parameters (utm_ prefix, fbclid, gclid) and SORT the surviving query
    * params. All regexp/array native expressions in one projection —
    * zero shuffles, fully codegen'd; patterns stay in the RE2∩Java
    * subset (the PiiFns rule) so the oracle replays them verbatim.
    * Emits `canon_url` plus `n_same` (dup-group size over the canonical
    * key — one keyed window, the payoff measurement).
    */
  def canonicalizeUrls(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        "^www\\.", ""),
      ":(443|80)$", "")
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val parts = filter(split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => p =!= lit("") && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)="))
    val q = array_join(array_sort(parts), "&")
    df.withColumn("canon_url", concat(scheme, lit("://"), host, path,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
      .withColumn("n_same", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("canon_url"))))
  }

  /** Blocklisted-term gate (the C4 "badwords" filter): per-document
    * blocked-token count WITH multiplicity, blocked fraction, and the
    * keep verdict. The term list rides as a literal array —
    * O(|terms|) per token inside whole-stage codegen, ZERO shuffles;
    * the right shape while the list fits a literal (hundreds of
    * terms). For dictionary-sized lists use [[blocklistFilterJoin]].
    * Docs with null text or zero tokens are unscoreable and dropped.
    * `blocked_frac` is one long/long IEEE division — bit-stable
    * cross-engine.
    */
  def blocklistFilter(docs: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String], maxFrac: Double): DataFrame = {
    val lowered = terms.map(_.toLowerCase)
    docs.where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .where(size(col("_toks")) > 0)
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        size(filter(col("_toks"), t => array_contains(typedlit(lowered), t)))
          .cast("long").as("n_blocked"))
      .withColumn("blocked_frac",
        col("n_blocked").cast("double") / col("n_tokens"))
      .withColumn("keep", col("blocked_frac") <= lit(maxFrac))
  }

  /** Join form of [[blocklistFilter]] for blocklists too large to
    * inline as a literal: explode tokens once, broadcast-hash-probe the
    * term table, one doc-keyed re-agg, left join back (no hits ⇒ 0).
    * Same output contract — pinned equal to the literal form in
    * CurationSpec. The corpus never shuffles against itself; the
    * blocklist ships to executors exactly once.
    */
  def blocklistFilterJoin(docs: DataFrame, idCol: String, textCol: String,
                          terms: DataFrame, termCol: String,
                          maxFrac: Double): DataFrame = {
    val d = docs.where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .where(size(col("_toks")) > 0)
      .select(col(idCol), size(col("_toks")).cast("long").as("n_tokens"),
        col("_toks"))
    val hits = d.select(col(idCol), explode(col("_toks")).as("_tok"))
      .join(broadcast(terms.select(lower(col(termCol)).as("_tok")).distinct()),
        Seq("_tok"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_blocked"))
    d.drop("_toks").join(hits, Seq(idCol), "left")
      .withColumn("n_blocked", coalesce(col("n_blocked"), lit(0L)))
      .withColumn("blocked_frac",
        col("n_blocked").cast("double") / col("n_tokens"))
      .withColumn("keep", col("blocked_frac") <= lit(maxFrac))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" shape): score every
    * document by how much more likely its word-bigram features are under
    * the TARGET distribution (rows where `isTarget`) than under the raw
    * corpus distribution —
    *   log w(x) = Σ_features log p̂_tgt(f) − log p̂_raw(f),
    * add-one smoothing over the raw vocabulary V on both sides, summed
    * over feature OCCURRENCES (multiplicity matters, as in hashed-n-gram
    * DSIR). High-weight docs are the ones to up-sample toward the target
    * domain.
    *
    * Scale shape: both distributions are one map-side-combined hash agg
    * over the exploded bigram stream; the per-feature log-ratio table is
    * vocabulary-sized and BROADCAST, so the per-occurrence lookup is a
    * map-side join — the corpus shuffles only on doc_id for the final
    * sum. Per-feature log-ratios are identical arithmetic in both
    * engines; only the per-doc sum is order-dependent, so it is
    * stableRound'ed.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column): DataFrame = {
    val feats = docs.where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .select(col(idCol), isTarget.as("_tgt"),
        explode(TextFns.shinglesFromTokens(col("_toks"), 2)).as("_f"))
    val raw = feats.groupBy(col("_f"))
      .agg(count(lit(1)).as("_rc"),
        count_if(col("_tgt")).as("_tc"))
    val totals = raw.agg(sum(col("_rc")).as("_rt"), sum(col("_tc")).as("_tt"),
      count(lit(1)).as("_v"))
    // one-row totals: broadcast explicitly — plan shape must not depend
    // on AQE noticing the side is tiny
    val ratios = raw.crossJoin(broadcast(totals))
      .select(col("_f"),
        (log((col("_tc") + lit(1.0)) / (col("_tt") + col("_v"))) -
          log((col("_rc") + lit(1.0)) / (col("_rt") + col("_v")))).as("_lr"))
    feats.join(broadcast(ratios), Seq("_f"))
      .groupBy(col(idCol))
      .agg(NumFns.stableRound(sum(col("_lr")), 6).as("logw"),
        count(lit(1)).as("n_feats"))
  }

  /** Per-document character-level Shannon entropy (nats) + quality gate:
    * low-entropy text is boilerplate/repetition (the cheapest of the
    * quality heuristics — a page of "buy buy buy…" scores ≈ 1 nat while
    * natural prose sits near 3). One explode of the character stream,
    * one (doc, char) hash agg (map-side combined), one doc-keyed re-agg;
    * zero joins against the corpus. Per-class −p·ln p terms are
    * identical arithmetic cross-engine; the per-doc sum is
    * order-dependent and stableRound'ed.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String,
                  minEntropy: Double): DataFrame = {
    // split("") emits the char array in ONE native pass; the positional
    // form (transform(sequence, i -> substr(text, i, 1))) re-scans the
    // UTF-8 bytes to locate codepoint i on every call — O(chars²) per
    // document (measured 10x slower at sf0.1).
    val chars = docs
      .where(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), length(col(textCol)).cast("long").as("n_chars"),
        explode(split(col(textCol), "")).as("_ch"))
    chars
      .groupBy(col(idCol), col("n_chars"), col("_ch"))
      .agg(count(lit(1)).as("_c"))
      .select(col(idCol), col("n_chars"),
        (-(col("_c").cast("double") / col("n_chars")) *
          log(col("_c").cast("double") / col("n_chars"))).as("_t"))
      .groupBy(col(idCol), col("n_chars"))
      .agg(NumFns.stableRound(sum(col("_t")), 6).as("entropy"))
      .withColumn("keep", col("entropy") >= lit(minEntropy))
  }

  /** C4-style cross-document line dedup (Raffel et al. 2020: any line
    * occurring in `maxDocs`-or-more documents corpus-wide is removed
    * from every document, and the survivors are reassembled in order).
    * The synthetic corpus has no newlines, so a "line" here is a
    * deterministic `segLen`-token segment; the mechanism — split,
    * count corpus-wide, drop frequent units, reassemble — is identical
    * to splitting on '\n'.
    *
    * Scale shape: one explode to (doc, pos, segment) rows; one
    * segment-keyed hash agg (map-side combined) filtered DOWN TO THE
    * FREQUENT TAIL before anything joins — boilerplate repeats by
    * definition, so the frequent-segment table is a tiny fraction of
    * the distinct-segment count and AQE broadcasts the membership
    * probe; the long unique tail never leaves the aggregation.
    * Reassembly is one doc-keyed agg collecting the kept (pos, seg)
    * structs and sorting them in-row — per-document cost, never a
    * global sort. Output: (id, n_segs, n_removed, clean_text).
    */
  def crossDocLineDedup(docs: DataFrame, idCol: String, textCol: String,
                        segLen: Int, maxDocs: Int): DataFrame = {
    require(segLen > 0 && maxDocs >= 2, s"bad segLen=$segLen maxDocs=$maxDocs")
    val segs = docs.where(col(textCol).isNotNull)
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .where(size(col("_toks")) > 0)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(_toks) / $segLen.0) as int) - 1)," +
          s" i -> array_join(slice(_toks, i * $segLen + 1, $segLen), ' '))")))
      .toDF(idCol, "pos", "seg")
    val frequent = segs.groupBy(col("seg"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .where(col("_nd") >= maxDocs)
      .select(col("seg"), lit(true).as("_drop"))
    segs.join(frequent, Seq("seg"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("_drop"), 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(array_sort(collect_list(
          when(col("_drop").isNull, struct(col("pos"), col("seg"))))),
          x => x.getField("seg")), " ").as("clean_text"))
  }

  /** Curation drop LEDGER — the per-document provenance record a
    * production pipeline keeps alongside the cleaned corpus: every
    * input document, its FIRST failing gate, and (for the dedup gates)
    * the surviving canonical it lost to. Gates run SEQUENTIALLY — each
    * stage sees only the previous stage's survivors, so a low-quality
    * duplicate is recorded as a quality drop (never as a dedup
    * survivor donor) and canonical choices are always made among clean
    * documents:
    *
    *  1. quality  — [[qualityMetrics]] + [[keepRule]]; degenerate docs
    *                (null text, < 2 tokens) fail here too.
    *  2. exact_dup — digest groups among quality passers; min-id
    *                survives, the rest record it as their canonical.
    *  3. near_dup — LSH+verified pairs among exact survivors,
    *                [[Components]] clustering; the component min-id is
    *                the canonical.
    *
    * Output: (id, stage ∈ quality|exact_dup|near_dup|kept,
    * canonical_id — null unless a dedup stage dropped the row, kept).
    * Scale shape: the quality gate's two corpus passes, one digest
    * hash-agg, the LSH pipeline over survivors, then id-keyed joins
    * assembling the verdicts — no new shuffle class beyond the gates
    * themselves.
    */
  def curationLedger(docs: DataFrame, idCol: String, textCol: String,
                     minWords: Long = 30L, maxTopFrac: Double = 0.11,
                     maxDupFrac: Double = 0.05,
                     estThreshold: Double = 0.3,
                     jaccardThreshold: Double = 0.4): DataFrame = {
    val base = docs.select(col(idCol), col(textCol))
    val qok = qualityMetrics(base, idCol, textCol)
      .where(keepRule(minWords, maxTopFrac, maxDupFrac))
      .select(col(idCol))
    // staged: survivors feed the digest agg, the LSH pipeline and the
    // final verdict joins
    val qPass = base.join(qok, Seq(idCol), "left_semi").localCheckpoint()
    val exactTag = qPass
      .select(col(idCol), md5(col(textCol).cast("binary")).as("_dg"))
      .withColumn("_exact_canon", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_dg"))))
      .drop("_dg")
    val survDocs = qPass.join(
      exactTag.where(col(idCol) === col("_exact_canon")).select(col(idCol)),
      Seq(idCol), "left_semi")
    val pairs = Dedup.lshVerifiedPairs(survDocs, idCol, textCol,
      estThreshold, jaccardThreshold)
    val comp = Components.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id").as(idCol), col("comp").as("_near_canon"))
    base.select(col(idCol))
      .join(qok.withColumn("_q", lit(true)), Seq(idCol), "left")
      .join(exactTag, Seq(idCol), "left")
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        when(col("_q").isNull, lit("quality"))
          .when(col(idCol) =!= col("_exact_canon"), lit("exact_dup"))
          .when(col("_near_canon").isNotNull &&
            col(idCol) =!= col("_near_canon"), lit("near_dup"))
          .otherwise(lit("kept")).as("stage"),
        when(col("_q").isNull, lit(null).cast("long"))
          .when(col(idCol) =!= col("_exact_canon"), col("_exact_canon"))
          .when(col("_near_canon").isNotNull &&
            col(idCol) =!= col("_near_canon"), col("_near_canon"))
          .otherwise(lit(null).cast("long")).as("canonical_id"))
      .withColumn("kept", col("stage") === "kept")
  }
}
