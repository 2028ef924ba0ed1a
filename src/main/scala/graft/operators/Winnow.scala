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
  * Selection runs as ONE fused per-row kernel
  * ([[graft.expressions.WinnowFps]]): a straight-line scan computes
  * the k-gram hashes once, then slides the rightmost-argmin window
  * over that array, emitting only the de-duplicated (pos, hash)
  * selections —
  * no explode until the final (doc, pos, hash) fingerprint rows, so
  * the corpus never materializes a per-character row stream. The hash
  * is the exact-integer polynomial fold (h·31 + code mod 2³¹) shared
  * with [[Features.featureHash]], replayable by any engine.
  */
object Winnow {

  /** Output: (idCol, pos, fp) — 1-based k-gram start position and the
    * k-gram hash of every selected fingerprint. Documents shorter than
    * k + w - 1 chars fingerprint their single shortest window (standard
    * winnowing degenerates gracefully: fewer than w hashes = one
    * window over what exists); documents shorter than k emit nothing.
    *
    * One fused kernel per document ([[graft.expressions.WinnowFps]]):
    * the composed transform/aggregate/slice form evaluated interpreted
    * expression trees once per position AND per window element —
    * measured 10.5 s at sf0.1 where the fused loop is ~0.3 s.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1)
    docs.where(col(textCol).isNotNull)
      .select(col(idCol),
        explode(graft.expressions.WinnowFps(col(textCol), k, w)).as("_fp"))
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
