package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The continuous-dedup loop's two load-bearing claims, proven on the
  * real corpus slice:
  *  - CONVERGENCE: any batch slicing, in any order, lands the three
  *    stores on the one-shot truth (full clustering + cluster-keyed
  *    splits over the union corpus).
  *  - CRASH RECOVERY: a batch killed with ANY subset of its three
  *    txn-fenced commits applied — sequential prefixes AND the
  *    out-of-order subsets a parallel commit section can leave —
  *    replays to the identical final state: the syncpoint-pinned
  *    reads recompute the same deltas from inputs no landed commit
  *    has mutated, and each view's fence skips what landed.
  */
class ContinuousDedupSpec extends SparkSpec {

  private def docs: DataFrame = graft.Tables.load(spark, sf(), "documents")
    .where(col("text").isNotNull).select(col("doc_id"), col("text"))

  private def freshStore(tag: String) = {
    val root = graft.sources.Scratch.processScoped(tag, sf())
    graft.sources.Scratch.deleteRecursively(new java.io.File(root))
    new graft.sources.SnapshotStore(spark, root)
  }

  private def labelsOf(st: graft.sources.SnapshotStore): Map[Long, Long] =
    st.read(ContinuousDedup.LabelsView).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def splitsOf(st: graft.sources.SnapshotStore): Map[Long, (Long, String)] =
    st.read(ContinuousDedup.SplitsView)
      .select(col("id"), col("group_id"), col("split")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private def fpsIdsOf(st: graft.sources.SnapshotStore): Set[Long] =
    st.read(ContinuousDedup.FpsView).select(col("id")).collect()
      .map(_.getLong(0)).toSet

  // one-shot truth over the union corpus: full clustering, then the
  // cluster-keyed split — what every incremental run must converge to
  private lazy val truth: (Map[Long, Long], Map[Long, (Long, String)]) = {
    val pairs = Dedup.lshVerifiedPairs(docs, "doc_id", "text",
      estThreshold = 0.3, jaccardThreshold = 0.4)
    val comp = Components.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id"), col("comp").as("_cc"))
    val labels = docs.select(col("doc_id").cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("_cc"), col("id")).as("comp"))
    val lm = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sm = Mixer.assignSplits(
        labels.select(col("id"), col("comp").as("group_id")), "group_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    (lm, sm)
  }

  private def runLoop(st: graft.sources.SnapshotStore,
                      hist: DataFrame, batches: Seq[DataFrame]): Unit = {
    ContinuousDedup.seed(st, hist, "doc_id", "text")
    batches.zipWithIndex.foreach { case (b, i) =>
      ContinuousDedup.processBatch(st, b, docs, "doc_id", "text", txnId = i + 1L)
    }
  }

  test("any batch slicing, any order, converges to the one-shot truth") {
    // slicing A: the q194 partition
    val stA = freshStore("cdspec_a")
    runLoop(stA,
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1),
      Seq(docs.where(col("doc_id") % 5 === 0), docs.where(col("doc_id") % 5 === 1)))
    assert(labelsOf(stA) == truth._1)
    assert(splitsOf(stA) == truth._2)
    assert(fpsIdsOf(stA) == truth._1.keySet)
    // slicing B: different partition AND scrambled arrival order
    // (the %3==2 slice lands before %3==1)
    val stB = freshStore("cdspec_b")
    runLoop(stB, docs.where(col("doc_id") % 3 === 0),
      Seq(docs.where(col("doc_id") % 3 === 2), docs.where(col("doc_id") % 3 === 1)))
    assert(labelsOf(stB) == truth._1)
    assert(splitsOf(stB) == truth._2)
  }

  test("crash after any commit prefix replays to the identical final state") {
    val hist = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val b1 = docs.where(col("doc_id") % 5 === 0)
    val b2 = docs.where(col("doc_id") % 5 === 1)
    val clean = freshStore("cdspec_clean")
    runLoop(clean, hist, Seq(b1, b2))
    for (stop <- 1 to 3) {
      val st = freshStore(s"cdspec_crash$stop")
      ContinuousDedup.seed(st, hist, "doc_id", "text")
      ContinuousDedup.processBatch(st, b1, docs, "doc_id", "text", txnId = 1L)
      // batch 2 dies mid-flight after `stop` commits (3 = all view
      // commits landed but the syncpoint publish did not)...
      ContinuousDedup.processBatchSteps(st, b2, docs, "doc_id", "text",
        txnId = 2L, Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1),
        0.3, 0.4, 32, 2, stopAfter = stop)
      // ...and the redelivery completes exactly what's missing
      ContinuousDedup.processBatch(st, b2, docs, "doc_id", "text", txnId = 2L)
      assert(labelsOf(st) == labelsOf(clean), s"labels diverge at stop=$stop")
      assert(splitsOf(st) == splitsOf(clean), s"splits diverge at stop=$stop")
      assert(fpsIdsOf(st) == fpsIdsOf(clean), s"fps diverge at stop=$stop")
      // the replayed batch's syncpoint landed, pinning the same cycle
      assert(st.appliedSyncTxns.contains(2L), s"syncpoint missing at stop=$stop")
      assert(st.readSync(ContinuousDedup.LabelsView).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap == labelsOf(clean))
    }
  }

  test("crash leaving an OUT-OF-ORDER commit subset replays to the identical state") {
    // the parallel section can land any subset before a crash — not
    // just splits→labels→fps prefixes; each such state must replay to
    // the clean-run truth because the deltas recompute from the
    // syncpoint-pinned (pre-batch) inputs, never from "latest"
    val hist = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val b1 = docs.where(col("doc_id") % 5 === 0)
    val b2 = docs.where(col("doc_id") % 5 === 1)
    val clean = freshStore("cdspec_ooo_clean")
    runLoop(clean, hist, Seq(b1, b2))
    val cases = Seq(
      Set(ContinuousDedup.SplitsView),                            // labels+fps won
      Set(ContinuousDedup.SplitsView, ContinuousDedup.LabelsView), // only fps won
      Set(ContinuousDedup.LabelsView))                            // splits+fps won
    cases.zipWithIndex.foreach { case (skip, i) =>
      val st = freshStore(s"cdspec_ooo$i")
      ContinuousDedup.seed(st, hist, "doc_id", "text")
      ContinuousDedup.processBatch(st, b1, docs, "doc_id", "text", txnId = 1L)
      ContinuousDedup.processBatchSteps(st, b2, docs, "doc_id", "text",
        txnId = 2L, Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1),
        0.3, 0.4, 32, 2, stopAfter = 4, skip = skip)
      skip.foreach(v => assert(!st.appliedTxns(v).contains(2L)))
      ContinuousDedup.processBatch(st, b2, docs, "doc_id", "text", txnId = 2L)
      assert(labelsOf(st) == labelsOf(clean), s"labels diverge, skip=$skip")
      assert(splitsOf(st) == splitsOf(clean), s"splits diverge, skip=$skip")
      assert(fpsIdsOf(st) == fpsIdsOf(clean), s"fps diverge, skip=$skip")
      assert(st.appliedSyncTxns.contains(2L))
    }
  }

  test("cycle readers never see a torn batch (syncpoint isolation)") {
    val hist = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val b1 = docs.where(col("doc_id") % 5 === 0)
    val b2 = docs.where(col("doc_id") % 5 === 1)
    val st = freshStore("cdspec_iso")
    ContinuousDedup.seed(st, hist, "doc_id", "text")
    ContinuousDedup.processBatch(st, b1, docs, "doc_id", "text", txnId = 1L)
    val cycleLabels = labelsOf(st)
    val cycleSplits = splitsOf(st)
    // batch 2 crashes after the SPLITS commit only: a latest-version
    // reader can now see split rows whose labels never landed...
    ContinuousDedup.processBatchSteps(st, b2, docs, "doc_id", "text",
      txnId = 2L, Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1),
      0.3, 0.4, 32, 2, stopAfter = 1)
    val tornSplitIds = st.read(ContinuousDedup.SplitsView)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val tornLabelIds = st.read(ContinuousDedup.LabelsView)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert((tornSplitIds -- tornLabelIds).nonEmpty,
      "latest-version reads should exhibit the splits-ahead-of-labels tear")
    // ...but a CYCLE reader resolving the one syncpoint still sees the
    // pre-crash cycle, consistent across ALL THREE views
    val syncLabels = st.readSync(ContinuousDedup.LabelsView).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val syncSplits = st.readSync(ContinuousDedup.SplitsView)
      .select(col("id"), col("group_id"), col("split")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val syncFpsIds = st.readSync(ContinuousDedup.FpsView)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(syncLabels == cycleLabels)
    assert(syncSplits == cycleSplits)
    assert(syncFpsIds == cycleLabels.keySet)
    // split == split(comp) holds inside the syncpointed cycle
    assert(syncSplits.keySet == syncLabels.keySet)
    // the replay then flips cycle readers to the full batch atomically
    ContinuousDedup.processBatch(st, b2, docs, "doc_id", "text", txnId = 2L)
    val after = st.readSync(ContinuousDedup.SplitsView)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val afterLabels = st.readSync(ContinuousDedup.LabelsView)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(after == afterLabels, "post-replay cycle must be consistent")
    assert((after -- tornLabelIds).nonEmpty, "batch 2 docs became visible")
  }

  test("fully-applied redelivery is a zero-version no-op") {
    val st = freshStore("cdspec_replay")
    val hist = docs.where(col("doc_id") % 2 === 0)
    val b1 = docs.where(col("doc_id") % 2 === 1)
    runLoop(st, hist, Seq(b1))
    val views = Seq(ContinuousDedup.FpsView, ContinuousDedup.LabelsView,
      ContinuousDedup.SplitsView)
    val vs = views.map(v => st.versions(v).max) :+ st.syncpoints.max
    ContinuousDedup.processBatch(st, b1, docs, "doc_id", "text", txnId = 1L)
    assert(views.map(v => st.versions(v).max) :+ st.syncpoints.max == vs)
  }
}
