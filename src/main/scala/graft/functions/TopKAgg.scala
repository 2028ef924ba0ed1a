package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (similarity, neighbor-id) candidate row for bounded top-k. */
case class Scored(sim: Double, nid: Long)

/** Bounded top-k aggregation by (sim DESC, nid ASC) — the map-side
  * partial form of "rank window + filter rnk <= k".
  *
  * A `row_number().over(Window.partitionBy(qid))` plan must co-locate
  * ALL scored candidates of a query before ranking: window functions
  * have no partial aggregation, so at corpus scale every (query ×
  * corpus) scored row crosses the shuffle. This Aggregator keeps a
  * k-bounded, best-first buffer per group on the map side, so only k
  * rows per partition per query reach the exchange — the scale-correct
  * top-k plan (ObjectHashAggregate with partial merge).
  *
  * Buffer is a best-first-sorted Vector capped at k; insertion is O(k)
  * with an early reject when the candidate is worse than the current
  * k-th. Deterministic: ties on sim break by ascending nid, exactly the
  * ordering the window form used.
  */
class TopKBySim(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.nid < b.nid)

  private def insert(buf: Seq[Scored], in: Scored): Seq[Scored] =
    if (buf.length >= k && better(buf.last, in)) buf
    else {
      val idx = buf.indexWhere(b => better(in, b))
      val grown = if (idx < 0) buf :+ in
                  else (buf.take(idx) :+ in) ++ buf.drop(idx)
      if (grown.length > k) grown.take(k) else grown
    }

  override def zero: Seq[Scored] = Vector.empty
  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = insert(buf, in)
  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = b.foldLeft(a)(insert)
  override def finish(buf: Seq[Scored]): Seq[Scored] = buf
  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
