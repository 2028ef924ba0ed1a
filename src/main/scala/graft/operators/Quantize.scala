package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-style) quantization of embedding columns — the
  * compression step production vector search runs before anything
  * touches disk at scale: a 64-dim float corpus shrinks 4x (byte codes
  * vs floats), and distance kernels run over bytes with a per-query
  * rescale. This is the "SQ8" member of the PQ/SQ family; the codebook
  * here is the per-dimension (min, max) range.
  *
  * Two passes, both scale-shaped:
  *  1. Codebook: posexplode -> (dim, min, max) hash agg — map-side
  *     combined, output is O(dims) rows, collected to the driver and
  *     inlined as array literals (same sanctioned O(small) collect as
  *     KMeans centroids: the codebook IS a model parameter).
  *  2. Encode: one narrow projection over the corpus —
  *     `transform` + `floor((x-mn)/(mx-mn)*255 + 0.5)` per element,
  *     no shuffle, no join, fully codegen'd.
  *
  * All arithmetic is double (`float` inputs widened exactly), and every
  * op (subtract, divide, multiply, floor) is an exact-sequence IEEE
  * computation an oracle can replay bit-for-bit from the raw data.
  * Constant dimensions (mx == mn) encode to 0 rather than dividing by
  * zero.
  */
object Quantize {

  /** Per-dimension (min, max) codebook of an `array<float/double>`
    * column. Returns (dim index 0-based, mn, mx) rows, one per dim.
    */
  def codebook(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("_v", col(vecCol).cast("array<double>"))
      .select(posexplode(col("_v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Quantize `vecCol` to 0..255 integer codes plus the max absolute
    * per-vector reconstruction error. Emits the input's `idCol`,
    * `codes: array<int>`, `max_err: double`.
    */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val book = codebook(df, vecCol).orderBy(col("i")).collect()
    val mnLit = array(book.map(r => lit(r.getDouble(1))): _*)
    val mxLit = array(book.map(r => lit(r.getDouble(2))): _*)
    def mnAt(i: Column) = element_at(mnLit, i + 1)
    def mxAt(i: Column) = element_at(mxLit, i + 1)
    def codeOf(x: Column, i: Column): Column =
      when(mxAt(i) === mnAt(i), lit(0))
        .otherwise(floor((x - mnAt(i)) / (mxAt(i) - mnAt(i)) * 255.0 + 0.5).cast("int"))
    def reconOf(c: Column, i: Column): Column =
      mnAt(i) + c.cast("double") / 255.0 * (mxAt(i) - mnAt(i))
    df.withColumn("_v", col(vecCol).cast("array<double>"))
      .withColumn("codes", transform(col("_v"), (x, i) => codeOf(x, i)))
      .withColumn("max_err",
        aggregate(
          transform(col("_v"), (x, i) => abs(x - reconOf(element_at(col("codes"), i + 1), i))),
          lit(0.0), (a, b) => greatest(a, b)))
      .select(col(idCol), col("codes"), col("max_err"))
  }
}
