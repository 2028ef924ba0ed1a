package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A table range-partitioned and sorted on ONE key prunes scans on that
  * key only; queries that box-filter on two keys (custkey AND orderkey,
  * date AND region) still touch every file. Interleaving the bits of
  * both keys into one Morton code and range-writing on it gives every
  * file a tight min/max envelope on BOTH dimensions — the standard
  * z-ordering layout trick, and at 100 TB the difference between
  * scanning a few files and scanning the table for 2-d selective
  * queries. File skipping then happens in whatever metadata layer
  * tracks per-file stats; `LayoutSpec` measures it directly from the
  * written files' column min/max.
  *
  * The code is a pure bit-interleave (shift/and/or fold — whole-stage
  * codegen'd, exactly replayable in any engine's integer SQL). Inputs
  * must be non-negative and fit in `bits` bits; callers mod/scale
  * first.
  */
object Layout {

  /** Morton code of two non-negative keys, `bits` bits each
    * (z = a0 b0 a1 b1 ... interleaved, a in the even positions).
    */
  def mortonCode(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` z-clustered on (aCol, bCol): range-partition by the
    * Morton code into `files` output files, sort within partitions, so
    * each file covers a compact z-range => tight min/max on BOTH
    * dimensions.
    */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String, bits: Int,
                  files: Int, path: String): Unit =
    df.withColumn("_z", mortonCode(col(aCol), col(bCol), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Hilbert index of two non-negative keys, `bits` bits each — the
    * native codegen'd expression [[graft.expressions.HilbertCode]].
    * Unlike the Morton code the Hilbert curve never takes long
    * diagonal jumps, so equal-width code ranges are CONNECTED 2-D
    * tiles: per-file envelopes come out tighter than z-order's on the
    * same data (LayoutSpec measures both). Same input contract as
    * [[mortonCode]].
    */
  def hilbertCode(a: Column, b: Column, bits: Int): Column =
    graft.expressions.HilbertCode(a, b, bits)

  /** [[zorderWrite]] with the Hilbert key: range-partition by the
    * Hilbert index, sort within partitions — each file covers one
    * connected curve segment.
    */
  def hilbertWrite(df: DataFrame, aCol: String, bCol: String, bits: Int,
                   files: Int, path: String): Unit =
    df.withColumn("_h", hilbertCode(col(aCol), col(bCol), bits))
      .repartitionByRange(files, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
      .write.mode("overwrite").parquet(path)

  /** Hilbert index of a d-DIMENSIONAL point (2..6 coordinates, `bits`
    * bits each, d·bits ≤ 63) — real CLUSTER BY takes 3-4 columns; the
    * native expression [[graft.expressions.HilbertCodeN]] (Skilling's
    * d-dimensional transpose walk). Same non-negative/fit-in-bits
    * input contract; null in any coordinate ⇒ null code.
    */
  def hilbertCodeN(cols: Seq[Column], bits: Int): Column =
    graft.expressions.HilbertCodeN(cols, bits)
}
