package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable bounded top-k buffer: parallel primitive arrays of capacity
  * `k`, kept best-first sorted. `insert` is allocation-free — once full,
  * a worse-than-k-th candidate is rejected with one compare; an accepted
  * candidate shifts the tail in place.
  */
final class TopKBuf(val k: Int) {
  val sims = new Array[Double](k)
  val nids = new Array[Long](k)
  var n: Int = 0

  // true iff (s1, n1) ranks strictly before (s2, n2); Double.compare
  // ranks NaN largest, matching ORDER BY sim DESC in Spark and DuckDB
  @inline private def before(s1: Double, n1: Long, s2: Double, n2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && n1 < n2)
  }

  def insert(s: Double, id: Long): Unit = {
    if (n >= k && !before(s, id, sims(n - 1), nids(n - 1))) return
    var pos = n
    while (pos > 0 && before(s, id, sims(pos - 1), nids(pos - 1))) pos -= 1
    if (pos >= k) return
    var j = math.min(n, k - 1)
    while (j > pos) { sims(j) = sims(j - 1); nids(j) = nids(j - 1); j -= 1 }
    sims(pos) = s
    nids(pos) = id
    if (n < k) n += 1
  }
}

/** Native bounded top-k by (sim DESC, nid ASC) — the tier-(b) form of
  * TopKBySim: a Catalyst `TypedImperativeAggregate` instead of a typed
  * `Aggregator` behind `udaf()`. The udaf path deserializes every input
  * row into a Scala case class and re-encodes the buffer across the
  * partial/final boundary; this expression reads its two child columns
  * straight off the `InternalRow` and mutates a primitive buffer —
  * zero per-row allocation on the hot (reject) path. Same ordering
  * contract as TopKBySim (java.lang.Double.compare: NaN ranks first,
  * ties break by ascending nid), pinned equal in TopKAggSpec.
  *
  * Null sims/nids are skipped: a null similarity (CosineSim length
  * mismatch) never ranks, matching the rank-window form where
  * `ORDER BY sim DESC` places nulls last and the rnk<=k filter drops
  * them at any real corpus size.
  *
  * Emits array<struct<sim,nid>> best-first; only k entries per group
  * per partition cross the exchange (ObjectHashAggregate partial merge).
  */
case class TopKSimAgg(simExpr: Expression, nidExpr: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(simExpr, nidExpr)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (simExpr.dataType == DoubleType && nidExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_by_sim requires (double, bigint), got ${simExpr.dataType} / ${nidExpr.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sim", DoubleType, nullable = false),
      StructField("nid", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by_sim"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buffer: TopKBuf, input: InternalRow): TopKBuf = {
    val s = simExpr.eval(input)
    val id = nidExpr.eval(input)
    if (s != null && id != null)
      buffer.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.n) { buffer.insert(other.sims(i), other.nids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuf): Any =
    new GenericArrayData(Array.tabulate[Any](buffer.n)(i =>
      InternalRow(buffer.sims(i), buffer.nids(i))))

  override def serialize(buffer: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putDouble(buffer.sims(i)); bb.putLong(buffer.nids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuf(k)
    var i = 0
    // entries arrive already ordered; insert keeps the invariant cheap
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSimAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSimAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSimAgg =
    copy(simExpr = newChildren(0), nidExpr = newChildren(1))
}
