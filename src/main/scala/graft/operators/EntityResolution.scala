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
  * only runs on same-block pairs, and the argmin is a per-dirty-key
  * window with WindowGroupLimit (only candidate pairs, never the
  * registry, reach that shuffle). At 100 TB registry scale the block
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
    val w = Window.partitionBy(col("d_id"))
      .orderBy(col("dist"), col("c_id"))
    // semantics-preserving prune around the O(len²) DP: a length gap
    // > maxDist already implies dist > maxDist, so those pairs skip
    // the DP entirely (codegen-cheap length compare). The THRESHOLD
    // form of levenshtein was measured SLOWER here: its band is
    // 2·maxDist+1 wide — no smaller than these names — so it pays the
    // banding bookkeeping without shrinking the table (5.3 s vs 3.5 s
    // on q112 at sf0.1); band only when maxDist << typical length.
    c.join(broadcast(d), Seq("_blk"))
      .where(abs(length(col("d_name")) - length(col("c_name_"))) <= maxDist)
      .withColumn("dist", levenshtein(col("d_name"), col("c_name_")))
      .where(col("dist") <= maxDist)
      .withColumn("_r", row_number().over(w))
      .where(col("_r") === 1)
      .select(col("d_id"), col("d_name"), col("c_id"), col("c_name_"), col("dist"))
  }
}
