package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: match each "dirty" record to its best
  * candidate in a clean registry — equality on a blocking attribute
  * prunes the cross product, Levenshtein edit distance scores the
  * survivors, and the per-record argmin (ties by candidate id) picks
  * the link. The classic two-table entity-resolution shape (dedupe's
  * blocking + compare + classify stages, with a deterministic
  * classifier a SQL oracle replays exactly — both engines implement
  * the identical unit-cost edit-distance DP).
  *
  * Scale shape: the dirty batch is the SMALL side by construction
  * (records needing linkage), so it broadcasts — the registry streams
  * through a broadcast join with zero shuffle, the O(len²) distance
  * only runs on same-block pairs, and the per-dirty-key argmin reduces
  * ahead of its shuffle (WindowGroupLimit's rank-1 pushdown in
  * [[resolve]], partial min(struct) in [[resolveJaro]] — only reduced
  * candidates, never the registry, reach it). At 100 TB registry scale the block
  * key moves into the registry's partition layout (ViewStore partition
  * pruning), and loose blocks get the LSH-candidate treatment
  * (Dedup.minHashLsh) instead of a wider equality block.
  */
object EntityResolution {

  /** @return one row per linked dirty record: (dirty id, dirty name,
    *         matched registry id, matched name, dist). Dirty records
    *         with no candidate within `maxDist` are dropped (no-match).
    */
  def resolve(dirty: DataFrame, dirtyId: String, dirtyName: String,
              clean: DataFrame, cleanId: String, cleanName: String,
              blockCol: String, maxDist: Int): DataFrame = {
    val d = dirty.select(col(dirtyId).as("d_id"), col(dirtyName).as("d_name"),
      col(blockCol).as("_blk"))
    val c = clean.select(col(cleanId).as("c_id"), col(cleanName).as("c_name_"),
      col(blockCol).as("_blk"))
    // semantics-preserving prune around the O(len²) DP: a length gap
    // > maxDist already implies dist > maxDist, so those pairs skip
    // the DP entirely (codegen-cheap length compare). The THRESHOLD
    // form of levenshtein was measured SLOWER here: its band is
    // 2·maxDist+1 wide — no smaller than these names — so it pays the
    // banding bookkeeping without shrinking the table (5.3 s vs 3.5 s
    // on q112 at sf0.1); band only when maxDist << typical length.
    // The argmin stays the row_number window: WindowGroupLimit already
    // keeps only each partition's rank-1 candidates ahead of the
    // shuffle, and the min(struct(dist, c_id, …)) aggregate form —
    // identical semantics, spec-pinned — was measured SLOWER (4.4 s vs
    // 3.8 s on q112 at sf0.1): struct min buffers are not hash-agg
    // mutable, so it plans as SortAggregate and map-side-sorts the
    // full candidate set for the same pre-shuffle reduction the group
    // limit gets without sorting.
    val w = Window.partitionBy(col("d_id"))
      .orderBy(col("dist"), col("c_id"))
    // CPU-width guard on the DP stage (see [[Spread.cpuWide]]): the
    // O(len²) distance runs in the registry scan's own stage, and scan
    // parallelism is sized by BYTES — a registry small in bytes but
    // expensive per row plans 1 task and serializes the whole DP on one
    // core. A registry at real scale passes through untouched.
    Spread.cpuWide(c).join(broadcast(d), Seq("_blk"))
      .where(abs(length(col("d_name")) - length(col("c_name_"))) <= maxDist)
      .withColumn("dist", levenshtein(col("d_name"), col("c_name_")))
      .where(col("dist") <= maxDist)
      .withColumn("_r", row_number().over(w))
      .where(col("_r") === 1)
      .select(col("d_id"), col("d_name"), col("c_id"), col("c_name_"), col("dist"))
  }

  /** [[resolve]] with the Jaro-Winkler metric
    * ([[graft.expressions.JaroWinkler]]) instead of Levenshtein: link
    * each dirty record to the highest-similarity candidate in its
    * block at-or-above `minSim`, ties by candidate id. The similarity
    * is decimal-pinned (`stableRound`, scale 9) BEFORE the argmax and
    * the threshold, so the selection an oracle replays is over exact
    * decimals, never raw cross-engine doubles. Same broadcast-block +
    * partial-combined aggregate argmax shape as [[resolve]] (the argmax
    * rides min(struct(-sim, …)) — negation of a scale-9 decimal-pinned
    * double is exact).
    */
  def resolveJaro(dirty: DataFrame, dirtyId: String, dirtyName: String,
                  clean: DataFrame, cleanId: String, cleanName: String,
                  blockCol: String, minSim: Double): DataFrame = {
    val d = dirty.select(col(dirtyId).as("d_id"), col(dirtyName).as("d_name"),
      col(blockCol).as("_blk"))
    val c = clean.select(col(cleanId).as("c_id"), col(cleanName).as("c_name_"),
      col(blockCol).as("_blk"))
    // raw-score prefilter ahead of the pin: scale-9 rounding moves a
    // score by < 1e-9, so raw >= minSim - 1e-9 is a strict superset of
    // pinned >= minSim — semantics-invisible, and the (expensive)
    // %.15g format+decimal-parse runs only on threshold survivors, not
    // every blocked pair.
    // one row per d_id — [[resolve]]'s cardinality contract. d_name
    // rides inside the argmax struct (the similarity depends on it, so
    // duplicate ids with different names compete; best sim wins, ties
    // by candidate id then name)
    c.join(broadcast(d), Seq("_blk"))
      .withColumn("_raw",
        graft.expressions.JaroWinkler(col("d_name"), col("c_name_")))
      .where(col("_raw") >= minSim - 1e-9)
      .withColumn("sim", graft.functions.NumFns.stableRound(col("_raw"), 9))
      .where(col("sim") >= minSim)
      .groupBy(col("d_id"))
      .agg(min(struct(negate(col("sim")), col("c_id"), col("c_name_"),
        col("sim"), col("d_name"))).as("_m"))
      .select(col("d_id"), col("_m.d_name").as("d_name"),
        col("_m.c_id").as("c_id"),
        col("_m.c_name_").as("c_name_"), col("_m.sim").as("sim"))
  }
}
