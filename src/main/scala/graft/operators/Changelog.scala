package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog (CDC) maintenance operators — the table-upkeep half a
  * warehouse engine needs beyond append/overwrite sinks: applying an
  * upsert+delete stream to a snapshot, and building SCD2 validity
  * history from the same stream. ViewStore.merge covers keyed upserts;
  * these add DELETES (tombstones) and history — both pure
  * window-and-join dataflows, replayable exactly by a SQL oracle.
  */
object Changelog {

  /** A [[graft.sources.SnapshotStore.diff]] change feed re-shaped into
    * the ±1 op-rows [[IncrementalAgg.refreshWithRetractions]] consumes
    * — the glue that turns ANY table's CDC into aggregate-MV
    * maintenance: inserts emit (+1, post payload), deletes (−1, pre),
    * updates BOTH (−1 pre, +1 post — the retract/emit pair of every
    * streaming-SQL changelog model). `cols` are the payload columns
    * the downstream MV needs (its group key + measures); everything
    * else in the feed is dropped. O(changes) rows, one pass.
    */
  def cdcToOps(cdc: DataFrame, cols: Seq[String]): DataFrame = {
    val pre = cdc.where(col("change_type").isin("update", "delete"))
      .select(cols.map(c => col(s"${c}_pre").as(c)) :+ lit(-1).as("op"): _*)
    val post = cdc.where(col("change_type").isin("update", "insert"))
      .select(cols.map(c => col(s"${c}_post").as(c)) :+ lit(1).as("op"): _*)
    pre.unionByName(post)
  }

  /** Apply a changelog to a base snapshot: the LATEST change per key
    * (by `seqCol`, ties broken toward the higher seq being "later")
    * wins — an upsert (`opCol` = "U") replaces the key's row, a delete
    * ("D") tombstones it; keys without changes pass through.
    *
    * `changes` must carry the base's payload columns plus (`opCol`,
    * `seqCol`). Scale shape: one rank window over the changelog (small
    * relative to base), one anti-join and one union — the base is
    * never shuffled beyond the key anti-join.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCol: String,
                     seqCol: String, opCol: String,
                     tieBreak: Seq[String] = Seq.empty): DataFrame = {
    // a real changelog has a unique seq per key; when the caller's seq
    // can tie (derived changelogs), `tieBreak` columns make the rank
    // deterministic — any tie remaining after them must be a full-row
    // duplicate, where either pick yields the same output
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc +: tieBreak.map(col(_).desc): _*)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
    val touched = latest.select(col(keyCol))
    base.join(touched, Seq(keyCol), "left_anti")
      .unionByName(latest.where(col(opCol) === "U").drop(opCol, seqCol))
  }

  /** Build SCD2 validity history from a changelog: one row per change
    * with `valid_from` = its seq, `valid_to` = the next change's seq
    * for the key (null while current), `is_current` = no later change.
    * One LEAD window per key — the standard dimension-history shape.
    */
  def scd2(changes: DataFrame, keyCol: String, seqCol: String,
           tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol) +: tieBreak.map(col): _*)
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
