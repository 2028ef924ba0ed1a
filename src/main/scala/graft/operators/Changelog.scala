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
