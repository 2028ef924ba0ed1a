package graft.operators

import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over [[SnapshotStore]]:
  * an additive aggregate view (COUNT + SUMs per key — the
  * decomposable-aggregate family; AVG derives as sum/n at read time)
  * is refreshed from a delta batch WITHOUT recomputing the fact
  * table:
  *
  *  1. the delta collapses to per-key partials (one hash agg over the
  *     batch — O(delta), map-side combined);
  *  2. existing MV rows for the delta's keys are fetched by a
  *     left-semi probe and ADDED to the partials (sums and counts are
  *     associative, so `old + partial` is exact);
  *  3. the merged rows land via [[SnapshotStore.mergeInto]] — copy-on-
  *     write touches only the dirs whose key range holds a delta key.
  *
  * Total refresh cost: O(delta) + O(touched MV dirs). At 100 TB the
  * fact table is never re-read — this is the view-maintenance half of
  * the lakehouse story (the other half, exactly-once ingestion of the
  * facts themselves, is [[SnapshotStore.appendOnce]] / q138).
  */
object IncrementalAgg {

  /** Refresh the MV at `view` with `delta` facts: per `keyCol` key,
    * maintain `n` (fact count) and `sum_<c>` for every `sumCols`
    * column. Creates the view on first call. Returns the committed
    * version.
    */
  def refresh(store: SnapshotStore, view: String, delta: DataFrame,
              keyCol: String, sumCols: Seq[String]): Long = {
    val aggs = count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    val partial = delta.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    if (store.versions(view).isEmpty)
      return store.commit(view, partial, overwrite = true,
        statsCols = Seq(keyCol))
    // add existing MV rows for the delta's keys to the partials; the
    // combined rows upsert through the file-pruned copy-on-write merge
    val touched = store.read(view)
      .join(partial.select(col(keyCol)), Seq(keyCol), "left_semi")
    val mergeAggs = sum(col("n")).as("n") +:
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    val upserts = touched.unionByName(partial)
      .groupBy(col(keyCol)).agg(mergeAggs.head, mergeAggs.tail: _*)
    store.mergeInto(view, upserts, keyCol, statsCols = Seq(keyCol))
  }

  /** [[refresh]] for the full CUBE of `keys` — every rollup
    * granularity (2^|keys| grouping sets, the OLAP pre-aggregation
    * layer) maintained in ONE view through one refresh: the delta's
    * `cube()` partials are additive per grouping set exactly like the
    * flat aggregate's, so the whole lattice refreshes with one
    * O(2^k·delta) hash agg + one file-pruned merge — the fact table is
    * never re-read for ANY granularity. Rollup rows carry NULL in the
    * rolled-up key columns (standard cube output); the merge key is an
    * internal sentinel-coalesced concat (`_mvk`), so corpus keys must
    * not contain the 0x01 separator or equal the sentinel — the usual
    * reserved-value caveat of composite string keys.
    */
  def refreshCube(store: SnapshotStore, view: String, delta: DataFrame,
                  keys: Seq[String], sumCols: Seq[String]): Long = {
    require(keys.nonEmpty && keys.size <= 4, s"cube over 1..4 keys: $keys")
    val aggs = count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    val mvk = concat_ws("\u0001",
      keys.map(k => coalesce(col(k).cast("string"), lit("\u0002"))): _*)
    val partial = delta.cube(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_mvk", mvk)
    if (store.versions(view).isEmpty)
      return store.commit(view, partial, overwrite = true,
        statsCols = Seq("_mvk"))
    val touched = store.read(view)
      .join(partial.select(col("_mvk")), Seq("_mvk"), "left_semi")
    val mergeAggs = sum(col("n")).as("n") +:
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    val upserts = touched.unionByName(partial)
      .groupBy(col("_mvk") +: keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
    store.mergeInto(view, upserts, "_mvk", statsCols = Seq("_mvk"))
  }

  /** [[refresh]] with RETRACTIONS — the "counting algorithm" of the
    * incremental-view-maintenance literature: the delta carries an
    * `opCol` of +1 (insert) / −1 (delete of a previously-inserted
    * fact), partials become `sum(op)` / `sum(op·c)` (one hash agg,
    * O(delta)), existing rows merge by addition exactly as in
    * [[refresh]], and a key whose maintained count reaches ZERO is
    * REMOVED from the view (the mergeInto tombstone path) — the MV
    * stays equal to the one-shot aggregate over the surviving facts,
    * never accumulating dead keys. Deletes for facts never inserted
    * are out of contract (counts would go negative — the standard IVM
    * multiset assumption).
    */
  def refreshWithRetractions(store: SnapshotStore, view: String,
                             delta: DataFrame, keyCol: String,
                             sumCols: Seq[String],
                             opCol: String = "op",
                             txn: Option[Long] = None): Long = {
    val aggs = sum(col(opCol)).cast("long").as("n") +:
      sumCols.map(c => sum(col(opCol) * col(c)).as(s"sum_$c"))
    val partial = delta.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val mergeAggs = sum(col("n")).as("n") +:
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    val merged =
      if (store.versions(view).isEmpty) partial
      else store.read(view)
        .join(partial.select(col(keyCol)), Seq(keyCol), "left_semi")
        .unionByName(partial)
        .groupBy(col(keyCol)).agg(mergeAggs.head, mergeAggs.tail: _*)
    if (store.versions(view).isEmpty)
      store.commit(view, merged.where(col("n") =!= 0),
        overwrite = true, statsCols = Seq(keyCol), txn = txn)
    else
      store.mergeInto(view, merged.withColumn("_del", col("n") === 0),
        keyCol, deleteCol = Some("_del"), statsCols = Seq(keyCol), txn = txn)
  }

  /** Incremental maintenance of a JOIN view (MV = facts ⋈ dim on
    * `joinKey`, dim keys unique) under FACT APPENDS: the classic
    * ΔMV = Δfacts ⋈ dim — only the delta joins (the dim side
    * broadcasts when small, which is the dimension-table norm), and
    * the new rows land through the fact-id-keyed file-pruned merge.
    * The fact table is never re-read.
    */
  def refreshJoinFacts(store: SnapshotStore, view: String,
                       deltaFacts: DataFrame, dim: DataFrame,
                       factIdCol: String, joinKey: String): Long = {
    val rows = deltaFacts.join(dim, Seq(joinKey))
    if (store.versions(view).isEmpty)
      store.commit(view, rows, overwrite = true, statsCols = Seq(factIdCol))
    else store.mergeInto(view, rows, factIdCol, statsCols = Seq(factIdCol))
  }

  /** The other IVM direction for the same join view: DIM UPDATES.
    * ΔMV = (MV rows whose `joinKey` is in Δdim) re-joined to the new
    * dim rows — an O(affected) semi-probe + rejoin, never a fact-table
    * scan; the rewritten rows land through the same fact-id merge
    * (copy-on-write touches only dirs holding affected fact ids).
    * Δdim rows REPLACE the dim attributes for their key (SCD-1
    * semantics); dim-key deletes are out of scope here (they would
    * cascade row deletions — model those as fact retractions).
    */
  def refreshJoinDim(store: SnapshotStore, view: String,
                     deltaDim: DataFrame, factIdCol: String,
                     joinKey: String): Long = {
    require(store.versions(view).nonEmpty, s"$view: join MV not seeded")
    val dimCols = deltaDim.columns.filterNot(_ == joinKey).toSeq
    val touched = store.read(view)
      .join(deltaDim.select(col(joinKey)), Seq(joinKey), "left_semi")
    val rejoined = touched.drop(dimCols: _*).join(deltaDim, Seq(joinKey))
    store.mergeInto(view, rejoined, factIdCol, statsCols = Seq(factIdCol))
  }

  /** [[refresh]] for a NON-additive aggregate: per-key COUNT(DISTINCT)
    * maintained as a mergeable HLL sketch column. A distinct count
    * cannot be refreshed from `old + delta` scalars — re-counting
    * needs the fact table — but the SKETCH is a mergeable summary:
    * the MV stores (n, sk binary), the delta collapses to per-key
    * delta sketches (one map-side-combined hash agg, O(delta)), and
    * existing rows merge by `hll_union_agg` — exact same
    * touched-dirs-only copy-on-write as the additive path. This is
    * the sketch-as-MV-state pattern a 100 TB pre-aggregation layer
    * runs: facts are read once ever, estimates serve from the view at
    * any time with ~1.6% relative error (default lgK=12).
    */
  def refreshDistinctSketch(store: SnapshotStore, view: String,
                            delta: DataFrame, keyCol: String,
                            distinctCol: String): Long = {
    val partial = delta.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), hll_sketch_agg(col(distinctCol)).as("sk"))
    if (store.versions(view).isEmpty)
      return store.commit(view, partial, overwrite = true,
        statsCols = Seq(keyCol))
    val touched = store.read(view)
      .join(partial.select(col(keyCol)), Seq(keyCol), "left_semi")
    val upserts = touched.unionByName(partial)
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"), hll_union_agg(col("sk")).as("sk"))
    store.mergeInto(view, upserts, keyCol, statsCols = Seq(keyCol))
  }
}
