package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the multi-dimensional layout
  * key [[graft.operators.Layout]] range-writes on (the alternative to
  * its Morton/z-order code).
  *
  * Why Hilbert over Morton for file layout: a Morton curve takes long
  * diagonal jumps at every power-of-two boundary (…0111→…1000 flips
  * all interleaved bits), so a file covering a compact z-range can
  * still span a wide rectangle in (x, y); the Hilbert curve moves one
  * cell per step, so equal-width code ranges are tight, connected 2-D
  * tiles — per-file min/max envelopes on BOTH dimensions come out
  * measurably tighter, which at 100 TB is the difference in how many
  * files a 2-D box query reads (LayoutSpec measures both layouts on
  * the same data; the Databricks/Iceberg layout literature makes the
  * same call).
  *
  * The mapping is the classic bottom-up xy2d walk (Wikipedia's
  * formulation, exactly replayable in any engine's integer SQL — the
  * oracle replays it as a recursive CTE): for s = 2^(bits-1) … 1, add
  * s²·((3·rx) XOR ry) and rotate/flip the quadrant
  * (rx = bit s of x, ry = bit s of y). A stateful 10-iteration loop —
  * as a Column fold the rotate's (x,y) cross-references double the
  * expression tree per level (2^bits nodes); as a native expression
  * it is one tight generated loop inside whole-stage codegen, the
  * tier-(b) custom-Expression case.
  *
  * Inputs must be non-negative and fit in `bits` bits (callers
  * mod/scale first — same contract as [[graft.operators.Layout
  * .mortonCode]]); null in → null out.
  */
case class HilbertCode(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_code"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_code requires (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  private val n: Long = 1L << bits

  override def nullSafeEval(xIn: Any, yIn: Any): Any = {
    var x = xIn.asInstanceOf[Long]
    var y = yIn.asInstanceOf[Long]
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
        long $x = $xa;
        long $y = $ya;
        long $d = 0L;
        for (long $s = ${n >> 1}L; $s > 0; $s >>= 1) {
          long $rx = (($x & $s) > 0) ? 1L : 0L;
          long $ry = (($y & $s) > 0) ? 1L : 0L;
          $d += $s * $s * ((3L * $rx) ^ $ry);
          if ($ry == 0) {
            if ($rx == 1) {
              $x = ${n}L - 1 - $x;
              $y = ${n}L - 1 - $y;
            }
            long $t = $x; $x = $y; $y = $t;
          }
        }
        ${ev.value} = $d;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertCode =
    copy(left = newLeft, right = newRight)
}

object HilbertCode {
  def apply(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertCode(
      ColumnBridge.expressionEager(x.cast("long")),
      ColumnBridge.expressionEager(y.cast("long")), bits))
}
