package graft.operators

import graft.SparkSpec

class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  test("Holt linear trend: hand-computed recurrence, single-point degrades flat") {
    // alpha=0.5, beta=0.25 over y=[10, 20]:
    //   t1: l=10, b=0
    //   t2: l = .5*20 + .5*(10+0) = 15 ; b = .25*(15-10) + .75*0 = 1.25
    val df = Seq(("a", "2024-01-01", 10L), ("a", "2024-01-02", 20L),
      ("b", "2024-01-01", 7L)).toDF("k", "d", "y")
    val out = Smoothing.holtLinear(df, "k", "d", "y", 0.5, 0.25, 2)
      .collect().map(r => (r.getString(0), r.getLong(4),
        r.getDouble(2), r.getDouble(3), r.getDouble(5))).toSet
    assert(out == Set(
      ("a", 1L, 15.0, 1.25, 16.25), ("a", 2L, 15.0, 1.25, 17.5),
      ("b", 1L, 7.0, 0.0, 7.0), ("b", 2L, 7.0, 0.0, 7.0)), out.toString)
  }

  test("order comes from the ord column, not input row order") {
    val df = Seq(("a", "2024-01-02", 20L), ("a", "2024-01-01", 10L))
      .toDF("k", "d", "y")
    val r = Smoothing.holtLinear(df, "k", "d", "y", 0.5, 0.25, 1)
      .collect().head
    assert(r.getDouble(2) == 15.0 && r.getDouble(3) == 1.25)
  }
}
