package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing kernel: character k-gram polynomial hashes + the
  * rightmost-min sliding window + consecutive-duplicate collapse, in
  * ONE Scala loop per document. The composed higher-order-function form
  * (transform/aggregate/slice lambdas) evaluates interpreted expression
  * trees per position and per window element — measured 10.5 s at sf0.1
  * where this loop is milliseconds. CodegenFallback (the CmsEstimate
  * precedent): the eval is already a tight compiled loop; what matters
  * is escaping per-element expression-tree interpretation, not
  * whole-stage fusion of the surrounding projection.
  *
  * Character semantics: CODEPOINTS (DuckDB's substring/unicode view of
  * a string), hash = fold(cp, (acc·31 + cp) mod 2³¹) — the exact
  * arithmetic of Features.featureHash. Ties pick the RIGHTMOST minimal
  * position per window (`<=` replace in a left-to-right scan); a
  * selected (pos, hash) repeats only in consecutive windows, so
  * last-emitted collapse IS the distinct set, emitted in position
  * order. Documents shorter than k yield an empty array; fewer than w
  * hashes yield one window over what exists.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1)

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", LongType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps requires a string input, got $dt")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // codepoint array (DuckDB's character indexing)
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0; var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1; off += Character.charCount(cp)
    }
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31 + cps(i + j)) % 2147483648L; j += 1 }
      hs(i) = acc
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastP = -1L
    val nWin = math.max(m - w + 1, 1)
    var jw = 0
    while (jw < nWin) {
      var bh = Long.MaxValue
      var bp = -1
      var q = jw
      val end = math.min(jw + w, m)
      while (q < end) {
        if (hs(q) <= bh) { bh = hs(q); bp = q }
        q += 1
      }
      if (bp + 1L != lastP) {
        lastP = bp + 1L
        out += InternalRow(bp + 1L, bh) // 1-based position
      }
      jw += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  def apply(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(c), k, w))
}
