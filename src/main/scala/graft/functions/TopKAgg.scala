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
  * Buffer is a pair of parallel primitive arrays (sims, nids) kept
  * best-first sorted, at most k entries. Once the buffer is full, a
  * candidate worse than the current k-th is rejected with ONE double
  * compare and no allocation — at corpus scale that is the hot path
  * (almost every row), so the accept-path O(k) arraycopy is paid only
  * ~k·log(n) times per group. Primitive arrays also encode as flat
  * UnsafeArrayData (no per-element object round-trip), unlike the
  * previous Vector[Scored] buffer whose encoder walked a struct per
  * element on every partial-merge serialization.
  *
  * Ordering is java.lang.Double.compare on sim (descending): NaN ranks
  * LARGEST, exactly how both Spark's and DuckDB's `ORDER BY sim DESC`
  * rank it — so a zero-norm vector (cosine 0/0 = NaN) places the same
  * here as in the rank-window form and the oracle (pinned in
  * TopKAggSpec). Ties on sim break by ascending nid, also matching the
  * window form.
  */
class TopKBySim(k: Int)
    extends Aggregator[Scored, (Array[Double], Array[Long]), Seq[Scored]] {
  require(k > 0, "k must be positive")

  // true iff (s1, n1) ranks strictly before (s2, n2)
  private def before(s1: Double, n1: Long, s2: Double, n2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && n1 < n2)
  }

  private def insert(buf: (Array[Double], Array[Long]),
                     s: Double, id: Long): (Array[Double], Array[Long]) = {
    val (sims, nids) = buf
    val n = sims.length
    if (n >= k && !before(s, id, sims(n - 1), nids(n - 1))) buf
    else {
      var pos = n
      while (pos > 0 && before(s, id, sims(pos - 1), nids(pos - 1))) pos -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m)
      val ni = new Array[Long](m)
      System.arraycopy(sims, 0, ns, 0, pos)
      System.arraycopy(nids, 0, ni, 0, pos)
      ns(pos) = s
      ni(pos) = id
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(sims, pos, ns, pos + 1, tail)
        System.arraycopy(nids, pos, ni, pos + 1, tail)
      }
      (ns, ni)
    }
  }

  override def zero: (Array[Double], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray)

  override def reduce(buf: (Array[Double], Array[Long]), in: Scored)
      : (Array[Double], Array[Long]) = insert(buf, in.sim, in.nid)

  override def merge(a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long]))
      : (Array[Double], Array[Long]) = {
    var acc = a
    var i = 0
    while (i < b._1.length) { acc = insert(acc, b._1(i), b._2(i)); i += 1 }
    acc
  }

  override def finish(buf: (Array[Double], Array[Long])): Seq[Scored] =
    buf._1.indices.map(i => Scored(buf._1(i), buf._2(i)))

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long])]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
