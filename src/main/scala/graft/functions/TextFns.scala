package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning and text-analysis column functions.
  *
  * Clean-text semantics follow the reference's CleanNews transformer
  * (reference: airflow/dags/Batch_layer/batchPipeline.py:41-52): null if
  * len&lt;10, strip emoji, remove URLs/@mentions, drop '$'/'#', '_' -&gt; ' ',
  * trim. Re-expressed as native Catalyst expressions — no UDF, so the whole
  * chain stays inside whole-stage codegen and never blocks pushdown.
  */
object TextFns {

  /** URLs and @-prefixed handles: same regex family as the reference's
    * re.sub(r"(?:\@|http?\://|https?\://|www)\S+", ""). The second
    * Handle pass is provably redundant (the first consumes every
    * '@'+non-space run) but is retained because the reference applies
    * both substitutions — fidelity over minimality; keep all three
    * mirrors (cleanText, cleanTextUdf, SqlFragments.cleanExpr) in sync.
    */
  private val UrlOrMention = "(?:@|http://|https://|www)\\S+"
  private val Handle = "@[A-Za-z0-9]+"

  /** Common emoji / pictograph blocks (the reference strips emoji
    * codepoints one-by-one in Python; a character class does it in one
    * codegen'd regexp_replace).
    */
  private val Emoji =
    "[\\x{1F000}-\\x{1FAFF}\\x{2190}-\\x{21FF}\\x{2600}-\\x{27BF}\\x{FE00}-\\x{FE0F}\\x{2B00}-\\x{2BFF}]"

  /** Reference-fidelity clean: null when the raw text is shorter than 10
    * chars (dropped downstream by na.drop, mirroring dropna()).
    */
  def cleanText(c: Column): Column = {
    val stripped =
      regexp_replace(
        regexp_replace(regexp_replace(c, Emoji, ""), UrlOrMention, ""),
        Handle, "")
    // '$' and '#' deleted, '_' becomes space (translate: chars beyond the
    // replacement string's length are removed).
    val cleaned = trim(translate(stripped, "_$#", " "))
    when(c.isNull || length(c) < 10, lit(null).cast("string")).otherwise(cleaned)
  }

  /** Fidelity UDF variant of cleanText, mirroring the reference's Python
    * cleaning_news imperatively (SURVEY §2.10). Tests pin it equal to the
    * native expression; production uses the expression (a UDF is a
    * codegen barrier and hides the logic from Catalyst).
    */
  val cleanTextUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null || s.length < 10) null
      else {
        val noEmoji = s.codePoints().toArray.filterNot { cp =>
          (cp >= 0x1F000 && cp <= 0x1FAFF) || (cp >= 0x2190 && cp <= 0x21FF) ||
          (cp >= 0x2600 && cp <= 0x27BF) || (cp >= 0xFE00 && cp <= 0xFE0F) ||
          (cp >= 0x2B00 && cp <= 0x2BFF)
        }
        var t = new String(noEmoji, 0, noEmoji.length)
        t = t.replaceAll("(?:@|http://|https://|www)\\S+", "")
        t = t.replaceAll("@[A-Za-z0-9]+", "")
        t = t.replace("$", "").replace("#", "").replace("_", " ")
        t.trim
      }
    }

  /** Whitespace tokenization of lowercased text, empty tokens dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > lit(0))

  /** Whitespace token count (as long, to match BIGINT oracles). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword count: matches of letter-runs / digit-runs / single
    * punctuation — a cheap deterministic proxy for a real tokenizer's
    * token count.
    */
  def subwordCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Word n-grams (shingles) from a token array column. Safe to call
    * with an inline `tokens()` expression — the argument is evaluated
    * once per row (see the binding note below), so callers need no
    * staging tricks.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    // Bind the argument to a lambda variable via a one-element transform:
    // a subexpression referenced inside a higher-order-function lambda is
    // re-evaluated on EVERY lambda call, and CollapseProject folds staged
    // columns back inline — an inline tokens() argument re-tokenized the
    // document once per shingle position (O(tokens²) per doc). The bound
    // variable evaluates the argument exactly once per row regardless of
    // what the optimizer inlines.
    flatten(transform(array(toks), t =>
      when(size(t) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), size(t) - lit(n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n)))))))

  /** One-column shingle form; hot-path safe (the tokenizer is bound
    * once per row, not once per shingle position).
    */
  def wordShingles(c: Column, n: Int): Column = shinglesFromTokens(tokens(c), n)

  /** Canonical-form fingerprint: md5 over lowercased,
    * whitespace-collapsed, trimmed text. Two docs with the same
    * fingerprint are exact near-duplicates modulo spacing/case.
    */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")).cast("binary"))

  /** Default per-language marker-word lists for the n-gram/stopword
    * language-ID heuristic.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Count of tokens that appear in `words`. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("long")

  /** Heuristic language ID: the language whose marker words hit most
    * tokens; "und" (undetermined) when nothing hits. Ties broken by
    * language code order for determinism.
    */
  def langId(c: Column, markers: Map[String, Seq[String]] = LangMarkers): Column =
    langIdFromTokens(tokens(c), markers)

  /** langId over a staged token-array column (evaluates the tokenization
    * once instead of once per language).
    */
  def langIdFromTokens(toks: Column, markers: Map[String, Seq[String]] = LangMarkers): Column = {
    // struct sort: (-hits, lang) ascending => most hits first, code-order ties
    val scored = array(markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct((-markerHits(toks, words)).as("neg"), lit(lang).as("lang"))
    }: _*)
    val best = array_min(scored)
    // null token array (null text) => null, not an arbitrary language: the
    // per-language hit counts are all null, every struct ties, and
    // array_min would pick the lexicographically-first code (oracles
    // return NULL for null text).
    when(toks.isNull, lit(null).cast("string"))
      .when(best.getField("neg") === 0, lit("und"))
      .otherwise(best.getField("lang"))
  }
}
