package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection size of two SORTED `array<bigint>` columns as one fused
  * merge loop — the verify kernel of the set-similarity joins.
  *
  * `size(array_intersect(a, b))` builds a hash set per CALL and
  * materializes the intersection array it immediately discards; in a
  * candidate-verify join the expression runs once per candidate PAIR
  * (millions of calls), so per-call allocation dominates. The inputs
  * are already sorted (`sort_array` at signature build), so a two-pointer
  * merge counts the overlap in O(|a|+|b|) with zero allocation, inside
  * whole-stage codegen.
  *
  * Inputs MUST be duplicate-free and ascending (the set-join signature
  * frames are); ties advance both sides, so duplicate elements would
  * under-count vs array_intersect's set semantics.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      s"""
        int $na = $a.numElements(), $nb = $b.numElements();
        int $i = 0, $j = 0;
        long $c = 0L;
        while ($i < $na && $j < $nb) {
          long $x = $a.getLong($i); long $y = $b.getLong($j);
          if ($x == $y) { $c++; $i++; $j++; }
          else if ($x < $y) $i++; else $j++;
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
