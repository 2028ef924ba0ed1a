package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` / `array<double>`
  * columns (each side independently).
  *
  * The composed form (zip_with + three aggregate folds — VectorFns.cosine)
  * materializes an intermediate product array and walks both inputs four
  * times; this expression is one fused loop with three scalar
  * accumulators, generated into whole-stage codegen. Float inputs are
  * widened per element INSIDE the loop — (double)f is exact, so results
  * are bit-identical to the old transform(cast)-upstream form and to the
  * DuckDB oracle mirror (SqlFragments.cosineExpr), but no cast ever
  * materializes a converted copy of the array. That matters in join
  * shapes like brute-force ANN, where the expression runs once per
  * (query × corpus) PAIR: a per-pair transform allocated two fresh
  * arrays per similarity; the fused read allocates nothing.
  * Accumulation order matches the fold (index order, dot/na/nb summed
  * independently).
  *
  * This is the (b) tier of the custom-operator ladder: a Catalyst
  * Expression with doGenCode, not a UDF — no serialization boundary, no
  * codegen barrier.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // length mismatch -> null, matching the composed zip_with form
    // (which null-pads the shorter side and nulls the sum)
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val af = isFloat(left); val bf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = ${get(a, left)};
            double $y = ${get(b, right)};
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column wrapper — float arrays are consumed natively (no upstream
    * element-wise cast/copy; the expression widens inside its loop).
    */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
