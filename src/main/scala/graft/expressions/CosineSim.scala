package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two `array<double>` columns.
  *
  * The composed form (zip_with + three aggregate folds — VectorFns.cosine)
  * materializes an intermediate product array and walks both inputs four
  * times; this expression is one fused loop with three scalar
  * accumulators, generated into whole-stage codegen. Accumulation order
  * matches the fold (index order, dot/na/nb summed independently), so
  * results are bit-identical to the composed form and to the DuckDB
  * oracle mirror (SqlFragments.cosineExpr).
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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // length mismatch -> null, matching the composed zip_with form
    // (which null-pads the shorter side and nulls the sum)
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
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
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = $a.getDouble($i);
            double $y = $b.getDouble($i);
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
  /** Column wrapper; casts float arrays to double element-wise upstream. */
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.transform
    def dbl(c: Column) = transform(c, _.cast("double"))
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(dbl(a)), ColumnBridge.expression(dbl(b))))
  }
}
