package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dense-domain set kernel for the set-similarity joins: when the token
  * vocabulary is small (rank domain ≤ a few thousand), a per-set bitmap
  * of `ceil(V/64)` words beats both `array_intersect` (per-call hash
  * set) and the sorted-merge count (|a|+|b| branchy steps) — the
  * intersection size is a straight-line AND+popcount over a handful of
  * words. The set joins switch to this kernel exactly when the prefix
  * filter stops discriminating (dense vocab = every token frequent), so
  * the degenerate corpus for one algorithm is the ideal corpus for the
  * other.
  */
case class BitsetFromRanks(child: Expression, vocab: Int)
    extends UnaryExpression {
  require(vocab >= 1, s"vocab must be positive, got $vocab")

  private val words = (vocab + 63) / 64

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitset_from_ranks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitset_from_ranks requires array<bigint> input, got $dt")
    }

  /** Ranks are 1-based (rank r sets bit r-1); out-of-domain ranks throw
    * (a silent drop would yield a wrong intersection count).
    */
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val bm = new Array[Long](words)
    var i = 0
    while (i < n) {
      val r = a.getLong(i) - 1
      if (r < 0 || r >= vocab)
        throw new IllegalArgumentException(s"rank ${r + 1} outside [1, $vocab]")
      bm((r >> 6).toInt) |= (1L << (r & 63))
      i += 1
    }
    new GenericArrayData(bm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val r = ctx.freshName("r"); val bm = ctx.freshName("bm")
      s"""
        int $n = $a.numElements();
        long[] $bm = new long[$words];
        for (int $i = 0; $i < $n; $i++) {
          long $r = $a.getLong($i) - 1L;
          if ($r < 0L || $r >= ${vocab}L)
            throw new IllegalArgumentException("rank " + ($r + 1L) + " outside [1, $vocab]");
          $bm[(int)($r >> 6)] |= (1L << ($r & 63L));
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bm);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BitsetFromRanks {
  def apply(c: Column, vocab: Int): Column =
    ColumnBridge.column(BitsetFromRanks(ColumnBridge.expression(c), vocab))
}

/** Σ popcount(a[i] & b[i]) over two equal-width bitset columns — the
  * O(words) intersection count. Width mismatch is a null (malformed
  * pairing), matching the composed forms' null propagation.
  */
case class BitsetAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "bitset_and_count"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bitset_and_count requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var c = 0L
    var i = 0
    while (i < n) { c += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i)); i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $c = 0L;
          for (int $i = 0; $i < $n; $i++)
            $c += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
          ${ev.value} = $c;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitsetAndCount {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(BitsetAndCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
