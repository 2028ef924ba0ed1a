package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity of two strings — the prefix-boosted edit
  * metric record-linkage uses where Levenshtein's unit costs are too
  * coarse (transposition-heavy name noise scores high where edit
  * distance punishes it). Spark ships no Jaro metric; this is the
  * tier-(b) native expression — the O(len·window) match scan runs once
  * per row inside whole-stage codegen with zero boxing, the same
  * static-method-from-codegen shape Spark's own `levenshtein` uses.
  *
  * Exact classic semantics (empirically bit-matched against DuckDB's
  * `jaro_winkler_similarity` on randomized corpora, so an oracle can
  * replay it): match window `max(⌊max(l1,l2)/2⌋-1, 0)`, greedy
  * left-to-right matching, transpositions = half the mismatched
  * matched-pairs; Winkler boost `j + l·0.1·(1-j)` applied only when
  * jaro > 0.7, prefix l capped at 4. Either side empty ⇒ 0.0 (DuckDB's
  * convention, including empty-vs-empty). Null in ⇒ null out.
  * Comparison is per-UTF8-BYTE straight off the UTF8String buffer —
  * DuckDB's exact comparison unit on any input, and zero per-row
  * String allocation. For cross-engine compares the caller pins the
  * score through `NumFns.stableRound` (double rounding is the only
  * residual risk).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Static entry shared by eval and generated code. Operates on the
    * raw UTF-8 BYTES (zero per-row String allocation) — exactly
    * DuckDB's per-byte comparison, including on non-ASCII input.
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val l1 = a.numBytes
    val l2 = b.numBytes
    if (l1 == 0 || l2 == 0) return 0.0
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val jHi = math.min(i + w + 1, l2)
      var j = math.max(0, i - w)
      var found = false
      while (!found && j < jHi) {
        if (!m2(j) && a.getByte(i) == b.getByte(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      while (l < 4 && l < l1 && l < l2 && a.getByte(l) == b.getByte(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
