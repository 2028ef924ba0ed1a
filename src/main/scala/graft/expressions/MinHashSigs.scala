package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature vector over an `array<bigint>` of token hashes
  * h in [0, P): element i is min over tokens of (a_i * h + b_i) mod P
  * with P = 1000000007, a_i = 2i+1, b_i = (0x9E3779B9 * (i+1)) mod P —
  * exactly the permutation family of Dedup.minHashSignatures' composed
  * form (numHashes array_min(transform(...)) passes), fused into one
  * loop over the hashes with a numHashes-element running-min array.
  *
  * Null hash elements are skipped; an empty or all-null input yields a
  * null signature (the composed form's array_min over an empty array is
  * a null element — both make empty docs fall out of LSH pairing at the
  * est filter, see Dedup.minHashLsh).
  */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs requires array<bigint>, got $t")
  }

  private lazy val aConst: Array[Long] = Array.tabulate(numHashes)(i => 2L * i + 1)
  private lazy val bConst: Array[Long] = Array.tabulate(numHashes)(i => (0x9E3779B9L * (i + 1)) % P)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var seen = false
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        seen = true
        val h = arr.getLong(t)
        var i = 0
        while (i < numHashes) {
          val v = (aConst(i) * h + bConst(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aConst, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bConst, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      s"""
        int $n = $arr.numElements();
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        boolean $seen = false;
        for (int $t = 0; $t < $n; $t++) {
          if (!$arr.isNullAt($t)) {
            $seen = true;
            long $h = $arr.getLong($t);
            for (int $i = 0; $i < $numHashes; $i++) {
              long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
              if ($v < $mins[$i]) $mins[$i] = $v;
            }
          }
        }
        if (!$seen) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  def apply(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(hashes), numHashes))
}
