package graft.operators

import graft.functions.VectorFns
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

  /** The SQ8 codebook collected as (mn, mx) per dimension — the same
    * O(dims) model-parameter collect [[scalarQuantize]] performs
    * internally, exposed for search over stored codes ([[Similarity.sq8AdcTopK]]).
    */
  def sq8Params(df: DataFrame, vecCol: String): Array[(Double, Double)] =
    codebook(df, vecCol).orderBy(col("i")).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))

  /** Dequantize an SQ8 `codes` column back to doubles:
    * recon_i = mn_i + code_i / 255 · (mx_i − mn_i) — the exact mirror of
    * [[scalarQuantize]]'s reconstruction arithmetic (same ops the q72
    * oracle replays), as one codegen'd per-row transform.
    */
  def sq8Reconstruct(codes: Column, book: Array[(Double, Double)]): Column = {
    val mnLit = array(book.map(b => lit(b._1)): _*)
    val mxLit = array(book.map(b => lit(b._2)): _*)
    transform(codes, (c, i) =>
      element_at(mnLit, i + 1) +
        c.cast("double") / 255.0 * (element_at(mxLit, i + 1) - element_at(mnLit, i + 1)))
  }

  /** Product-quantization codebooks: the vector space is split into `m`
    * contiguous sub-spaces of dim/m dimensions, and each sub-space gets
    * its own k-cell Lloyd codebook (KMeans.fit, squared-L2 metric,
    * deterministic first-k-by-id seeds). A vector then compresses to m
    * small integers — dim×4 bytes -> m bytes at k<=256, the compression
    * family (SQ -> PQ) a 100 TB vector corpus actually uses.
    *
    * Scale shape: each sub-space fit is the KMeans shape — per-row
    * argmin projection (zero shuffle) + one k×(dim/m) hash aggregate per
    * iteration; only the m·k·(dim/m) = k·dim codebook doubles ever reach
    * the driver (a model parameter, like the SQ8 codebook above).
    *
    * `stableScale` (default 9) routes every centroid mean through
    * NumFns.stableRound inside the agg, making the whole Lloyd
    * trajectory — and therefore the codes — bit-replayable by the SQL
    * oracle (r15 of SUM/COUNT per dimension).
    *
    * @return one (cell id, centroid) codebook per sub-space, j = 0..m-1.
    */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String,
                  m: Int, k: Int, iterations: Int = 1,
                  stableScale: Option[Int] = Some(9)): Array[Array[(Long, Seq[Double])]] = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m sub-spaces")
    val sub = dim / m
    // FUSED across sub-spaces: the naive form (one KMeans.fit per
    // sub-space) scans the corpus m times per iteration — at 100 TB
    // that multiplies the dominant cost m-fold. Instead every iteration
    // runs ONE pass: per row, argmin every sub-space, explode the m
    // (j, cell, sub-vector) assignments (corpus bytes stay constant —
    // each exploded row carries only its slice), and ONE (j, cell)
    // hash aggregate computes all m·k·sub means. Arithmetic is
    // bit-identical to the per-sub-space fits (same seeds, same argmin,
    // same stableRound(sum/count)), so the q90/q94 oracles are
    // unaffected.
    val data = df.select(col(idCol).as("_id"), VectorFns.toDoubleArr(col(vecCol)).as("_v"))
    val seeds = data.orderBy(col("_id")).limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }
    require(seeds.nonEmpty, "PQ needs a non-empty input")
    var cents: Array[Array[(Long, Seq[Double])]] = (0 until m).toArray.map { j =>
      seeds.map { case (cid, v) => (cid, v.slice(j * sub, (j + 1) * sub)) }
    }
    var it = 0
    while (it < iterations) {
      val perJ = array((0 until m).map { j =>
        val sv = slice(col("_v"), j * sub + 1, sub)
        val scored = array_sort(array(cents(j).map { case (cid, cv) =>
          struct(aggregate(zip_with(sv, typedlit(cv), (x, c) => (x - c) * (x - c)),
            lit(0.0), (s, d) => s + d).as("d"), lit(cid).as("cell"))
        }: _*))
        struct(lit(j).as("j"),
          element_at(scored, 1).getField("cell").as("cell"), sv.as("sv"))
      }: _*)
      val meanCols = (0 until sub).map { i =>
        val mc = sum(element_at(col("sv"), i + 1)) / count(lit(1))
        stableScale.fold(mc)(sc => graft.functions.NumFns.stableRound(mc, sc)).as(s"_m$i")
      }
      val means = data.withColumn("_pj", perJ)
        .select(explode(col("_pj")).as("e"))
        .select(col("e.j").as("j"), col("e.cell").as("cell"), col("e.sv").as("sv"))
        .groupBy(col("j"), col("cell"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => ((r.getInt(0), r.getLong(1)), (2 until 2 + sub).map(r.getDouble).toSeq))
        .toMap
      cents = cents.zipWithIndex.map { case (book, j) =>
        book.map { case (cid, prev) => (cid, means.getOrElse((j, cid), prev)) }
      }
      it += 1
    }
    cents
  }

  /** Encode vectors against PQ codebooks: per sub-space argmin over the
    * inlined centroid literals — one narrow shuffle-free projection, the
    * same zero-join shape as ivfTopK's cell assignment. Emits
    * `codes: array<int>` (cell per sub-space, in sub-space order) and
    * `sq_err: double` — the total squared reconstruction error
    * (sum of the chosen per-sub-space squared distances, accumulated in
    * sub-space order so the oracle's fold matches bit-for-bit).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               books: Array[Array[(Long, Seq[Double])]]): DataFrame = {
    require(books.nonEmpty && books.head.nonEmpty, "empty codebooks")
    val sub = books.head.head._2.length
    val staged = df.withColumn("_v", VectorFns.toDoubleArr(col(vecCol)))
    val best = books.zipWithIndex.map { case (book, j) =>
      val sv = slice(col("_v"), j * sub + 1, sub)
      val scored = array_sort(array(book.map { case (cid, cv) =>
        struct(
          aggregate(zip_with(sv, typedlit(cv), (x, c) => (x - c) * (x - c)),
            lit(0.0), (s, d) => s + d).as("d"),
          lit(cid).as("cell"))
      }: _*))
      (element_at(scored, 1).getField("cell").cast("int"),
        element_at(scored, 1).getField("d"))
    }
    staged.select(col(idCol),
      array(best.map(_._1): _*).as("codes"),
      best.map(_._2).reduce(_ + _).as("sq_err"))
  }
}
