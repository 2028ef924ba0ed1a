package graft.operators

import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The continuous-dedup loop, end to end: the composition a production
  * ingest pipeline actually runs per micro-batch, maintaining THREE
  * keyed ACID stores that together answer "is this new document a
  * duplicate, which near-dup cluster does it belong to, and which
  * train/val/test split may it enter without leaking?"
  *
  *  - `fps`    — (id, digest, sig, shard): MinHash fingerprints of every
  *               absorbed document ([[IncrementalDedup]]'s store).
  *  - `labels` — (id, comp): the near-dup cluster labeling
  *               ([[Components]] min-ids), maintained INCREMENTALLY —
  *               per batch only the changed/new slice is upserted
  *               ([[Components.incrementalComponentsDelta]] +
  *               SnapshotStore.mergeIntoOnce), never an O(corpus)
  *               rewrite.
  *  - `splits` — (id, group_id, split): leakage-free split assignment
  *               keyed on the cluster representative
  *               ([[Mixer.groupAwareSplits]]' invariant: a cluster lands
  *               in exactly one split); docs whose cluster merges get
  *               their split REASSIGNED in the same delta, so the store
  *               always equals split(comp) exactly.
  *
  * Per micro-batch (exactly once, keyed by the foreachBatch txn id):
  *  1. LSH-verify the batch against the fingerprint store AND itself →
  *     new edges ([[IncrementalDedup.verifiedEdges]]; only batch-side
  *     bucket probes, stored-vs-stored never re-derived).
  *  2. Fold the edges into the stored labeling on the LABEL graph —
  *     O(new edges), broadcast remap — and take the changed/new delta;
  *     batch docs with no edges join as their own singleton clusters.
  *  3. Upsert splits, then labels, then absorb fingerprints — each
  *     commit txn-fenced, so a redelivered batch no-ops and a CRASH
  *     between commits replays to the identical final state. The order
  *     is load-bearing: deltas are deterministic functions of (batch,
  *     fps, labels), so every prefix of the commit sequence that
  *     survives a crash leaves those inputs unchanged for the replay to
  *     recompute the SAME deltas — splits (a pure function of the
  *     labels delta) must therefore commit before labels itself.
  *  4. Publish ONE txn-tagged SYNCPOINT pinning the three post-batch
  *     versions — the batch's reader-visible commit point. Per-view
  *     manifests make each store individually consistent, but a reader
  *     resolving "latest" per view between steps 3a-3c can still see a
  *     split row whose label has not landed (the splice tear
  *     [[SnapshotStore.publishSync]] exists to close). Cycle readers
  *     therefore resolve ONE syncpoint ([[SnapshotStore.readSync]]):
  *     the batch becomes visible to them ATOMICALLY at the single
  *     link(2) syncpoint publish, or not at all — a crash anywhere
  *     before it leaves the previous cycle the visible one, and the
  *     replay's store-level txn fence completes exactly the missing
  *     commits before re-pinning.
  *
  * Reference anchor: this is the reference's lambda speed-layer upsert
  * contract (twitterConsumerStream.py:110-127 — idempotent keyed merge
  * per micro-batch) applied to the dedup/cluster/split stores instead
  * of the serving table.
  */
object ContinuousDedup {

  val FpsView = "fps"
  val LabelsView = "labels"
  val SplitsView = "splits"

  private def withSplit(labels: DataFrame, names: Seq[String],
                        fractions: Seq[Double]): DataFrame =
    Mixer.assignSplits(
      labels.select(col("id"), col("comp").as("group_id")),
      "group_id", names, fractions)

  /** One-time seed from the historical corpus: fingerprint snapshot,
    * one-shot clustering, cluster-keyed splits. Idempotent by re-run
    * (all three commits overwrite).
    */
  def seed(store: SnapshotStore, hist: DataFrame,
           idCol: String, textCol: String,
           names: Seq[String] = Seq("train", "val", "test"),
           fractions: Seq[Double] = Seq(0.8, 0.1, 0.1),
           estThreshold: Double = 0.3, jaccardThreshold: Double = 0.4,
           numHashes: Int = 32, shingleN: Int = 2): Unit = {
    val docs = hist.where(col(textCol).isNotNull)
    IncrementalDedup.snapshotAcid(store, FpsView, docs, idCol, textCol,
      numHashes, shingleN)
    val pairs = Dedup.lshVerifiedPairs(docs, idCol, textCol,
      estThreshold, jaccardThreshold, shingleN)
    val clustered = Components.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id"), col("comp").as("_cc"))
    val labels = docs.select(col(idCol).cast("long").as("id"))
      .join(clustered, Seq("id"), "left")
      .select(col("id"), coalesce(col("_cc"), col("id")).as("comp"))
      .localCheckpoint()
    store.commit(LabelsView, labels, overwrite = true)
    store.commit(SplitsView, withSplit(labels, names, fractions),
      overwrite = true)
    // the seed cycle's syncpoint: cycle readers have a consistent
    // pinned view from the very first publish
    store.publishSync(
      Seq(FpsView, LabelsView, SplitsView)
        .map(v => v -> store.versions(v).max).toMap)
    ()
  }

  /** Fold one micro-batch in, exactly once under `txnId`. `corpusText`
    * is the master text table (historical + all batches) used only to
    * verify LSH candidates — at store scale a keyed lookup table, never
    * scanned whole.
    */
  def processBatch(store: SnapshotStore, batch: DataFrame,
                   corpusText: DataFrame, idCol: String, textCol: String,
                   txnId: Long,
                   names: Seq[String] = Seq("train", "val", "test"),
                   fractions: Seq[Double] = Seq(0.8, 0.1, 0.1),
                   estThreshold: Double = 0.3, jaccardThreshold: Double = 0.4,
                   numHashes: Int = 32, shingleN: Int = 2): Unit =
    processBatchSteps(store, batch, corpusText, idCol, textCol, txnId,
      names, fractions, estThreshold, jaccardThreshold, numHashes, shingleN,
      stopAfter = 4)

  /** [[processBatch]] with a crash-injection point: stop after the
    * first `stopAfter` commits (1 = splits only, 2 = +labels, 3 = +fps,
    * 4 = +syncpoint = the full batch). The recovery spec drives this to
    * prove a replayed batch converges from every crash prefix, and the
    * isolation spec uses prefix 1-3 to show cycle readers never see the
    * un-syncpointed partial batch.
    */
  private[graft] def processBatchSteps(store: SnapshotStore, batch: DataFrame,
                                       corpusText: DataFrame,
                                       idCol: String, textCol: String,
                                       txnId: Long, names: Seq[String],
                                       fractions: Seq[Double],
                                       estThreshold: Double,
                                       jaccardThreshold: Double,
                                       numHashes: Int, shingleN: Int,
                                       stopAfter: Int): Unit = {
    // the STORE-LEVEL fence: a batch whose syncpoint landed is fully
    // applied — zero work, zero reads, zero version movement. (A batch
    // whose view commits all landed but whose syncpoint did not falls
    // through: the per-view fences below skip the commits and only the
    // missing syncpoint publishes.)
    if (store.appliedSyncTxns.contains(txnId)) return
    // a replay whose THREE view commits all landed (crash between fps
    // and the syncpoint) needs none of the LSH/delta computation — only
    // the missing syncpoint publish below
    val needViews = Seq(SplitsView, LabelsView, FpsView)
      .exists(v => !store.appliedTxns(v).contains(txnId))
    if (needViews) {
      val docs = batch.where(col(textCol).isNotNull)
      // fingerprint the batch ONCE (edges + absorb both consume it), and
      // materialize the edge set before it fans out: the labeling delta
      // references the edges three times (endpoint mapping, new-node
      // anti-join, singleton exclusion) and each un-staged reference
      // would re-run the whole LSH banding pass
      val bfp = IncrementalDedup.fingerprints(docs, idCol, textCol,
        numHashes, shingleN).localCheckpoint()
      val edges = IncrementalDedup.verifiedEdgesFromFps(store.read(FpsView),
        bfp, corpusText, idCol, textCol, numHashes, bands = 8,
        estThreshold, jaccardThreshold, shingleN).localCheckpoint()
      val storedLabels = store.read(LabelsView)
      val edgeDelta = Components.incrementalComponentsDelta(
        storedLabels, edges, "a_id", "b_id")
      // batch docs with no near-dup edge become singleton clusters; the
      // stored-side anti-join (bucketed at store scale, q193's layout)
      // keeps a replayed-or-overlapping batch from resetting a label
      val singles = docs.select(col(idCol).cast("long").as("id"))
        .join(edgeDelta.select(col("id")), Seq("id"), "left_anti")
        .join(storedLabels.select(col("id").cast("long").as("id")),
          Seq("id"), "left_anti")
        .withColumn("comp", col("id"))
      // the delta feeds two commits — materialize once (O(delta) rows)
      val delta = edgeDelta.unionByName(singles).localCheckpoint()
      store.mergeIntoOnce(SplitsView, withSplit(delta, names, fractions),
        "id", txnId)
      if (stopAfter <= 1) return
      store.mergeIntoOnce(LabelsView, delta, "id", txnId)
      if (stopAfter <= 2) return
      store.appendOnce(FpsView, bfp, txnId)
    }
    if (stopAfter <= 3) return
    // the batch's ATOMIC reader-visible commit point: one link(2)
    // publish pinning all three post-batch versions, fenced by the
    // same txn id
    store.publishSync(
      Seq(FpsView, LabelsView, SplitsView)
        .map(v => v -> store.versions(v).max).toMap,
      txn = Some(txnId))
    ()
  }
}
