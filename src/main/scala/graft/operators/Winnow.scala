package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS local fingerprinting algorithm): hash every character
  * k-gram, slide a window of `w` consecutive hashes, keep the minimum
  * of each window (RIGHTMOST position on ties), de-duplicate the
  * selections. Guarantees: any shared substring of length >= w + k - 1
  * between two documents yields at least one shared fingerprint, and
  * the selected density is ~2/(w+1) — the local, position-robust
  * alternative to whole-document hashing (q17) for partial-overlap /
  * plagiarism-style detection.
  *
  * Everything is one codegen'd projection per document: the char array
  * is bound once per row (split("")), k-gram hashes and the per-window
  * rightmost-argmin both run inside bound-variable lambdas over that
  * array — no explode until the final (doc, pos, hash) fingerprint
  * rows, so the corpus never materializes a per-character row stream.
  * The hash is the exact-integer polynomial fold (h·31 + code mod 2³¹)
  * shared with [[Features.featureHash]], replayable by any engine.
  */
object Winnow {

  /** Output: (idCol, pos, fp) — 1-based k-gram start position and the
    * k-gram hash of every selected fingerprint. Documents shorter than
    * k + w - 1 chars fingerprint their single shortest window (standard
    * winnowing degenerates gracefully: fewer than w hashes = one
    * window over what exists); documents shorter than k emit nothing.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1)
    val spark = docs.sparkSession
    // hs = k-gram polynomial hashes, bound-lambda over the char array
    // (cs is a lambda variable: the tokenizer trap — an inlined
    // expression re-evaluates per element — cannot bite)
    val hashesExpr =
      s"""flatten(transform(array(split($textCol, '')), cs ->
            CASE WHEN size(cs) < $k THEN cast(array() AS array<bigint>)
            ELSE transform(sequence(1, size(cs) - ${k - 1}),
              i -> aggregate(slice(cs, i, $k), 0L,
                (acc, ch) -> (acc * 31 + ascii(ch)) % 2147483648L)) END))"""
    // per window j (1-based over hashes), rightmost argmin: <= replaces
    // on ties, scanning left-to-right => the LAST minimal position wins.
    // _hs is itself re-bound to a lambda variable (hs) — otherwise
    // CollapseProject would inline the whole k-gram hash computation
    // into the per-window lambda and re-hash the document per window.
    val selExpr =
      s"""flatten(transform(array(_hs), hs ->
            transform(sequence(1, greatest(size(hs) - ${w - 1}, 1)),
              j -> aggregate(
                sequence(j, least(j + ${w - 1}, size(hs))),
                struct(9223372036854775807L AS h, -1L AS p),
                (acc, q) -> CASE WHEN element_at(hs, cast(q AS int)) <= acc.h
                  THEN struct(element_at(hs, cast(q AS int)) AS h,
                              cast(q AS bigint) AS p)
                  ELSE acc END))))"""
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), expr(hashesExpr).as("_hs"))
      .where(size(col("_hs")) > 0)
      .select(col(idCol), array_distinct(expr(selExpr)).as("_sel"))
      .select(col(idCol), explode(col("_sel")).as("_fp"))
      .select(col(idCol), col("_fp.p").as("pos"), col("_fp.h").as("fp"))
  }

  /** Shared-fingerprint pairs: documents that share at least
    * `minShared` distinct winnowed fingerprints, with the shared count
    * — the candidate stage of a partial-overlap detector. One
    * fingerprint-keyed equi-join; hot fingerprints (boilerplate) are
    * capped by `maxPostings` exactly like an LSH bucket cap.
    */
  def sharedPairs(fps: DataFrame, idCol: String,
                  minShared: Int = 2, maxPostings: Int = 256): DataFrame = {
    val posting = fps.groupBy(col("fp"))
      .agg(collect_set(col(idCol)).as("ids"))
      .where(size(col("ids")).between(2, maxPostings))
    posting
      .select(col("fp"), explode(expr(
        """flatten(transform(array_sort(ids), (x, i) ->
             transform(slice(array_sort(ids), i + 2,
               greatest(size(ids) - i - 1, 0)),
               y -> struct(x AS a_id, y AS b_id))))""")).as("pp"))
      .groupBy(col("pp.a_id").as("a_id"), col("pp.b_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
