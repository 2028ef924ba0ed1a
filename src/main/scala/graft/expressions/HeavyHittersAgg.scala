package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable heavy-hitter summary: a Misra–Gries counter set (the
  * bounded CANDIDATE generator) + a Count-Min sketch (the unbiased-high
  * count estimator) + the exact row count, all folded in one pass.
  *
  * Misra–Gries with `k` counters undercounts any key by at most n/(k+1),
  * and the bound survives merges (Agarwal et al., "Mergeable summaries"):
  * merge = sum matching counters, then subtract the (k+1)-th largest
  * count from all and drop the non-positive. So with k >= 2/minFrac - 1,
  * every key holding > minFrac of the rows still has a positive counter
  * after any merge tree — the candidate set is a guaranteed SUPERSET of
  * the true hot set, and is at most k keys by construction. The CMS then
  * refines each candidate's count from above (overestimate <= eps*n at
  * the configured confidence), so the final `est > minFrac*total` filter
  * never drops a truly hot key; it can only admit keys within eps of the
  * threshold.
  */
final class HhBuf(val k: Int, val eps: Double, val conf: Double) {
  var n: Long = 0L
  // var, not val: deserialize adopts the INCOMING sketch verbatim, so
  // a buffer round-trips whatever (eps, conf) it was built with
  var cms: CountMinSketch = CountMinSketch.create(eps, conf, 42)
  val counters = new java.util.HashMap[Any, Long]()

  def add(key: Any): Unit = {
    n += 1
    cms.add(key)
    val c = counters.get(key)
    if (c != 0L || counters.containsKey(key)) counters.put(key, c + 1)
    else if (counters.size < k) counters.put(key, 1L)
    else decrementAll()
  }

  // the classic MG step: an unseen key with a full table decrements
  // every counter (the new key's own +1 and one -1 cancel out)
  private def decrementAll(): Unit = {
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
    }
  }

  /** Fold `other` in: CMS merges exactly; MG counters sum, then the
    * table shrinks back to `k` by subtracting the (k+1)-th largest
    * count (the mergeable-summaries reduction — error bounds add).
    */
  def merge(other: HhBuf): Unit = {
    n += other.n
    cms.mergeInPlace(other.cms)
    val it = other.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counters.put(e.getKey, counters.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counters.size > k) {
      val vals = new Array[Long](counters.size)
      val vit = counters.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val eit = counters.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** One-pass heavy-hitter detection over a bigint or string key column —
  * the extreme-cardinality substitute for an exact `groupBy(key).count`
  * whose agg output would itself be too large to materialize. Emits one
  * struct per group: `total` (exact row count), `candidates` (the
  * Misra–Gries survivor keys — a bounded superset of every key above
  * share 1/(k+1)), and `cms` (the serialized Count-Min sketch, probed
  * per candidate via [[CmsEstimate]]).
  *
  * State per buffer is O(k + 1/eps) regardless of key cardinality, and
  * only that fixed-size summary crosses the exchange.
  */
case class HeavyHittersAgg(keyExpr: Expression, k: Int,
                           eps: Double = 1e-3, conf: Double = 0.99,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HhBuf] {
  require(k > 0, "k must be positive")

  import org.apache.spark.sql.types._

  override def children: Seq[Expression] = Seq(keyExpr)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    keyExpr.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"heavy_hitters requires a bigint or string key, got $t")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("candidates", ArrayType(keyExpr.dataType, containsNull = false)),
    StructField("cms", BinaryType)))
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): HhBuf = new HhBuf(k, eps, conf)

  override def update(buffer: HhBuf, input: InternalRow): HhBuf = {
    val v = keyExpr.eval(input)
    if (v != null) {
      // UTF8String values may alias reused row buffers — keep a stable
      // JVM String (which is also what CountMinSketch.add hashes)
      val key: Any = v match {
        case s: UTF8String => s.toString
        case other => other
      }
      buffer.add(key)
    }
    buffer
  }

  override def merge(buffer: HhBuf, other: HhBuf): HhBuf = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: HhBuf): Any = {
    val keys = buffer.counters.keySet().toArray
    // deterministic candidate order (MG survivor sets are order-free)
    java.util.Arrays.sort(keys, new java.util.Comparator[AnyRef] {
      def compare(a: AnyRef, b: AnyRef): Int =
        String.valueOf(a).compareTo(String.valueOf(b))
    })
    val arr: Array[Any] = keys.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    }
    InternalRow(buffer.n, new GenericArrayData(arr),
      buffer.cms.toByteArray)
  }

  override def serialize(buffer: HhBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.n)
    val cmsBytes = buffer.cms.toByteArray
    out.writeInt(cmsBytes.length)
    out.write(cmsBytes)
    out.writeInt(buffer.counters.size)
    val it = buffer.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.getKey match {
        case s: String =>
          // length-prefixed UTF-8, not writeUTF: the 2-byte writeUTF
          // length caps keys at 64KB, and this is the arbitrary-string
          // extreme-cardinality path
          val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.writeBoolean(true); out.writeInt(bytes.length); out.write(bytes)
        case l: java.lang.Long => out.writeBoolean(false); out.writeLong(l)
      }
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HhBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new HhBuf(k, eps, conf)
    buf.n = in.readLong()
    val cmsLen = in.readInt()
    val cmsBytes = new Array[Byte](cmsLen)
    in.readFully(cmsBytes)
    buf.cms = CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val key: Any =
        if (in.readBoolean()) {
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        } else java.lang.Long.valueOf(in.readLong())
      buf.counters.put(key, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(keyExpr = newChildren(0))
}

object HeavyHittersAgg {
  def apply(key: Column, k: Int, eps: Double, conf: Double): Column =
    ColumnBridge.column(HeavyHittersAgg(ColumnBridge.expression(key), k, eps, conf)
      .toAggregateExpression())
}
