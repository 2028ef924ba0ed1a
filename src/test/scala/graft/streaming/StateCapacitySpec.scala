package graft.streaming

import graft.model._
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Retention/eviction semantics of the speed-layer merge, pinned
  * deterministically with Spark's `TestGroupState` harness (the public
  * unit-test surface for flatMapGroupsWithState handlers). The
  * wall-clock FIRING of processing-time timeouts cannot be asserted in
  * this environment — with a timeout configured, Spark 4.1's
  * shouldRunAnotherBatch loop commits no-data batches continuously and
  * MemoryStream admission starves (source offset pinned at 0 for
  * thousands of batches, reproduced across both state APIs and both
  * store providers) — but the handler's behavior AT each clock state is
  * fully determined and pinned here; the capacity half (2000 live keys
  * on RocksDB) runs in TransformWithStateSpec.
  */
class StateCapacitySpec extends AnyFunSuite {

  private def sent(d: String, seq: Long, p: Double) =
    SpeedDelta(d, seq, None, Some(SentimentScore(p, 0.1, 0.2)))

  private val retention = Some(java.time.Duration.ofDays(2))

  test("timed-out day key is evicted: state removed, nothing emitted") {
    val prior = SpeedLayer.emptyRow("2026-08-01").copy(nbrArticle = 3L)
    val st = TestGroupState.create[SpeedRow](
      Optional.of(prior), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty(),
      hasTimedOut = true)
    val out = SpeedLayer.mergeHandler(retention)("2026-08-01", Iterator.empty, st)
    assert(out.isEmpty, "eviction must not emit a row")
    assert(st.isRemoved, "timed-out state must be removed")
  }

  test("live day key updates state AND re-arms its retention timeout") {
    val st = TestGroupState.create[SpeedRow](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty(),
      hasTimedOut = false)
    val out = SpeedLayer.mergeHandler(retention)(
      "2026-08-01", Iterator(sent("2026-08-01", 1, 0.8)), st).toSeq
    assert(out.map(_.nbrArticle) == Seq(1L))
    assert(st.isUpdated && !st.isRemoved)
    // timeout re-armed at batch time + retention: a key that keeps
    // receiving deltas never times out; one that goes quiet does
    assert(st.getTimeoutTimestampMs.get() == 1000L + retention.get.toMillis)
  }

  test("a re-arriving day after eviction folds from scratch (no ghost state)") {
    // eviction pass
    val prior = SpeedLayer.emptyRow("2026-08-01").copy(nbrArticle = 7L)
    val st1 = TestGroupState.create[SpeedRow](
      Optional.of(prior), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty(),
      hasTimedOut = true)
    SpeedLayer.mergeHandler(retention)("2026-08-01", Iterator.empty, st1)
    assert(st1.isRemoved)
    // the same key arrives again later: state starts empty, so the fold
    // restarts at article 1 — exactly the O(active days) contract
    val st2 = TestGroupState.create[SpeedRow](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = Optional.empty(),
      hasTimedOut = false)
    val out = SpeedLayer.mergeHandler(retention)(
      "2026-08-01", Iterator(sent("2026-08-01", 9, 0.2)), st2).toSeq
    assert(out.map(_.nbrArticle) == Seq(1L))
  }

  test("without retention no timeout is armed (NoTimeout contract holds)") {
    val st = TestGroupState.create[SpeedRow](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty(),
      hasTimedOut = false)
    val out = SpeedLayer.mergeHandler(None)(
      "2026-08-01", Iterator(sent("2026-08-01", 1, 0.8)), st).toSeq
    assert(out.size == 1 && st.isUpdated)
    assert(!st.getTimeoutTimestampMs.isPresent)
  }
}
