package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming reservoir sampling: keep an EXACT deterministic k-sample
  * per key over an unbounded stream — the online counterpart of
  * `Mixer.exactKPerGroup` (q75), and what a training-data ingest uses
  * to hold a bounded eval slice out of an endless crawl.
  *
  * Determinism comes from hash priorities instead of RNG state: each
  * element's priority is the 31-bit LCG fraction of its id, so the
  * reservoir is "the k smallest priorities seen so far" — a pure set
  * property, invariant to arrival order, micro-batch boundaries, and
  * replays (an at-least-once redelivery re-inserts an element the set
  * already holds — idempotent by construction). That is strictly
  * stronger than classic Vitter reservoir sampling, whose result
  * depends on arrival order and RNG draws that cannot be replayed
  * across engines.
  *
  * State per key is O(k) (a sorted vector of (priority, id)); each
  * micro-batch folds its rows in and truncates — `flatMapGroupsWithState`
  * with the same bounded-state contract as the speed-layer merge.
  */
object StreamSampler {

  case class Item(key: String, id: Long)
  case class Sampled(key: String, id: Long)

  private[streaming] def lcgFrac(id: Long): Double =
    ((id * 1103515245L + 12345L) % 2147483648L).toDouble / 2147483648.0

  /** Fold a batch of ids into the reservoir: union, de-dup, keep the k
    * smallest (priority, id) pairs.
    */
  private[streaming] def foldReservoir(state: Vector[(Double, Long)],
                                       ids: Iterator[Long],
                                       k: Int): Vector[(Double, Long)] =
    (state ++ ids.map(id => (lcgFrac(id), id))).distinct.sorted.take(k)

  private def handler(k: Int)(key: String, rows: Iterator[Item],
                              state: GroupState[Vector[(Double, Long)]]): Iterator[Sampled] = {
    val cur = foldReservoir(state.getOption.getOrElse(Vector.empty),
      rows.map(_.id), k)
    state.update(cur)
    cur.iterator.map { case (_, id) => Sampled(key, id) }
  }

  /** The per-key streaming reservoir: emits the CURRENT k-sample per
    * key each micro-batch (take the latest emission per key for the
    * final sample — the q95 foreachBatch pattern).
    */
  def reservoirK(items: Dataset[Item], k: Int): Dataset[Sampled] = {
    import items.sparkSession.implicits._
    items.groupByKey(_.key)
      .flatMapGroupsWithState[Vector[(Double, Long)], Sampled](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(handler(k))
  }
}
