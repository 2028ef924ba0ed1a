package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized `count_min_sketch(...)` aggregate for one item's
  * estimated count — the read half Spark's SQL surface lacks (the
  * builtin only BUILDS the sketch; estimating needs the JVM API).
  *
  * The deserialized sketch is memoized per expression instance keyed on
  * the binary's identity: the intended shape probes a per-group sketch
  * broadcast against a small probe set, so each task sees a handful of
  * distinct sketches and thousands of probes — without the memo every
  * probe row would re-parse the ~eps^-1-wide sketch. CodegenFallback is
  * deliberate: probing is a post-aggregation, probe-set-sized
  * projection, never a corpus-wide hot path.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      // item types mirror what CountMinSketch.add hashes: integral keys
      // by value, strings by their UTF-8 bytes
      case (BinaryType, LongType) | (BinaryType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate requires (binary sketch, bigint|string item), got ${left.dataType} / ${right.dataType}")
    }

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    // content equality only — an identity short-circuit would silently
    // serve a stale sketch if a reader ever reused and mutated a buffer
    // in place; the cache key is a private copy for the same reason
    if (lastSketch == null || !java.util.Arrays.equals(lastBytes, bytes))
      try {
        lastSketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
        lastBytes = bytes.clone()
      } catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException("cms_estimate: not a count_min_sketch binary", e)
      }
    item match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        lastSketch.estimateCount(s.toString)
      case l => lastSketch.estimateCount(l.asInstanceOf[Long])
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def apply(sketch: Column, item: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
}
