package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The d-dimensional Hilbert code: bijectivity and the defining
  * unit-step property (consecutive indices are Manhattan-distance-1
  * neighbors — the locality that makes equal-width code ranges
  * connected d-D tiles), agreement between codegen and interpreted
  * paths, the null contract, and 2-D locality parity with the pinned
  * xy2d form.
  */
class HilbertCodeNSpec extends SparkSpec {
  import spark.implicits._

  private def codeOf(xs: Seq[Long], bits: Int): Long = {
    val e = HilbertCodeN(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        xs.toArray, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
      bits, xs.size)
    e.eval(null).asInstanceOf[Long]
  }

  private def unitStepBijection(dims: Int, bits: Int): Unit = {
    val side = 1 << bits
    val cells = Seq.fill(dims)(0 until side)
      .foldLeft(Seq(Seq.empty[Int]))((acc, r) => acc.flatMap(p => r.map(p :+ _)))
    val coded = cells.map(c => codeOf(c.map(_.toLong), bits) -> c)
    // bijection onto [0, side^dims)
    assert(coded.map(_._1).sorted == (0L until math.pow(side, dims).toLong),
      s"not a bijection at dims=$dims bits=$bits")
    // unit steps: consecutive indices differ by 1 in exactly one axis
    val byCode = coded.sortBy(_._1).map(_._2)
    byCode.sliding(2).foreach { case Seq(a, b) =>
      val dist = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(dist == 1, s"non-unit step $a -> $b at dims=$dims bits=$bits")
    }
  }

  test("3-D and 4-D: bijection and unit-step walk over the full grid") {
    unitStepBijection(3, 2) // 8^3 = 512 cells
    unitStepBijection(4, 2) // 4^4 = 256 cells
    unitStepBijection(3, 3) // 8^3 over 3 bits = 512 cells
    unitStepBijection(2, 4) // 16^2 = 256 cells, the 2-D sanity case
  }

  test("column path (codegen) agrees with interpreted eval; null contract") {
    val rows = Seq((1L, 2L, 3L), (7L, 0L, 5L), (0L, 0L, 0L))
      .toDF("x", "y", "z")
      .select(graft.operators.Layout.hilbertCodeN(
        Seq(col("x"), col("y"), col("z")), 4).as("h"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(
      codeOf(Seq(1L, 2L, 3L), 4), codeOf(Seq(7L, 0L, 5L), 4), 0L))
    val withNull = Seq((Some(1L), None), (Some(2L), Some(3L)))
      .toDF("x", "y")
      .select(graft.operators.Layout.hilbertCodeN(Seq(col("x"), col("y")), 4).as("h"))
      .collect()
    assert(withNull(0).isNullAt(0))
    assert(!withNull(1).isNullAt(0))
  }

  test("locality: equal-width 3-D code ranges are tight boxes vs random order") {
    // range-splitting the curve must give piece envelopes whose summed
    // volume is far below the full cube repeated per piece
    val bits = 4
    val side = 1 << bits
    val pts = for (x <- 0 until side; y <- 0 until side; z <- 0 until side)
      yield (x.toLong, y.toLong, z.toLong)
    val coded = pts.map(p => codeOf(Seq(p._1, p._2, p._3), bits) -> p).sortBy(_._1)
    val pieces = coded.grouped(coded.size / 8).toSeq
    val vol = pieces.map { pc =>
      val xs = pc.map(_._2._1); val ys = pc.map(_._2._2); val zs = pc.map(_._2._3)
      (xs.max - xs.min + 1) * (ys.max - ys.min + 1) * (zs.max - zs.min + 1)
    }.sum
    val fullPerPiece = pieces.size.toLong * side * side * side
    assert(vol * 3 < fullPerPiece,
      s"curve pieces not tight: sum vol $vol vs $fullPerPiece")
  }
}
