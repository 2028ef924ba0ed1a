package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash signature over an `array<bigint>` of token hashes:
  * bit i of the result is set iff sum over tokens of (bit i of hash)*2-1
  * is positive.
  *
  * The composed form (aggregate + per-token 64-element zip_with —
  * Dedup.simHash's original body) allocates two 64-element arrays per
  * token; this expression is one fused loop over the hashes with 64 int
  * counters, generated into whole-stage codegen. Bit semantics are
  * identical to the composed form. Null hash elements are skipped
  * (token hashes are non-null by construction).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = arr.getLong(t)
        var i = 0
        while (i < 64) {
          cnt(i) += (((h >>> i) & 1L).toInt << 1) - 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (cnt(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt")
      val sig = ctx.freshName("sig")
      s"""
        int $n = $a.numElements();
        int[] $cnt = new int[64];
        for (int $t = 0; $t < $n; $t++) {
          if (!$a.isNullAt($t)) {
            long $h = $a.getLong($t);
            for (int $i = 0; $i < 64; $i++) {
              $cnt[$i] += ((int) (($h >>> $i) & 1L) << 1) - 1;
            }
          }
        }
        long $sig = 0L;
        for (int $i = 0; $i < 64; $i++) {
          if ($cnt[$i] > 0) $sig |= 1L << $i;
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
}
