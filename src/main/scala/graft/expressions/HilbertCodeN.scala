package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, lit, when}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hilbert-curve index of a d-DIMENSIONAL point (2 ≤ d ≤ 6, `bits`
  * bits per dimension, d·bits ≤ 63) — the general form of the 2-D
  * [[HilbertCode]], because real lakehouse CLUSTER BY takes 3–4
  * columns, not 2: a file layout range-written on this code gives
  * every file a tight min/max envelope on ALL d dimensions at once
  * ([[graft.sources.SnapshotStore.optimizeClusteredN]] builds on it,
  * q229 grades the 3-D box prune).
  *
  * Algorithm: Skilling's transpose-form walk ("Programming the Hilbert
  * curve", AIP Conf. Proc. 707, 2004 — the public-domain d-dimensional
  * formulation): Gray-decode/undo the per-level rotations in one
  * O(d·bits) bit pass over the coordinate array, then bit-interleave
  * the transposed axes into the scalar index. Pure shifts/xors — no
  * lookup tables — shipped into whole-stage codegen as a reference
  * object call over one packed `array(...)` child (the array pack is
  * itself codegen'd; the tiny per-row array is the price of arbitrary
  * arity, paid only in layout-rewrite jobs). (The 2-D [[HilbertCode]]
  * keeps its own xy2d walk: its curve orientation is pinned by
  * existing layouts/specs; both are Hilbert curves with the same
  * locality contract.)
  *
  * Coordinates must be non-negative longs fitting `bits` bits (callers
  * mod/scale first — the [[graft.operators.Layout]] contract). The
  * Column builder nulls the code when ANY coordinate is null (the
  * [[HilbertCode]] contract); the raw expression itself treats a null
  * ELEMENT as 0 so it stays total under speculative evaluation.
  */
case class HilbertCodeN(child: Expression, bits: Int, dims: Int)
    extends UnaryExpression {
  require(dims >= 2 && dims <= 6, s"hilbert_code_n takes 2..6 dims, got $dims")
  require(bits >= 1 && bits * dims <= 63,
    s"need bits >= 1 and dims*bits <= 63, got $dims x $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_code_n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hilbert_code_n requires array<bigint>, got $dt")
  }

  /** Skilling AxesToTranspose + interleave; `xs` is mutated scratch. */
  def compute(xs: Array[Long]): Long = {
    val n = xs.length
    // undo excess work: top-down per-level rotate/flip
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((xs(i) & q) != 0L) xs(0) ^= p
        else {
          val t = (xs(0) ^ xs(i)) & p
          xs(0) ^= t
          xs(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((xs(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // transpose -> scalar: bit j of axis k lands at position j*n+(n-1-k)
    var d = 0L
    var j = bits - 1
    while (j >= 0) {
      var k = 0
      while (k < n) {
        d = (d << 1) | ((xs(k) >>> j) & 1L)
        k += 1
      }
      j -= 1
    }
    d
  }

  /** Single entry for interpreted eval AND generated code. */
  def codeOf(a: ArrayData): Long = {
    val n = a.numElements()
    require(n == dims, s"hilbert_code_n: expected $dims coords, got $n")
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      xs(i) = if (a.isNullAt(i)) 0L else a.getLong(i)
      i += 1
    }
    compute(xs)
  }

  override def nullSafeEval(input: Any): Any =
    codeOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hcn", this, classOf[HilbertCodeN].getName)
    defineCodeGen(ctx, ev, c => s"$ref.codeOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HilbertCodeN =
    copy(child = newChild)
}

object HilbertCodeN {
  /** d-dimensional Hilbert code column; null when ANY coordinate is
    * null (matching [[HilbertCode]]'s per-coordinate null contract).
    */
  def apply(cols: Seq[Column], bits: Int): Column = {
    val longs = cols.map(_.cast("long"))
    val raw = ColumnBridge.column(HilbertCodeN(
      ColumnBridge.expressionEager(array(longs: _*)), bits, cols.size))
    when(longs.map(_.isNull).reduce(_ || _), lit(null).cast("long"))
      .otherwise(raw)
  }
}
