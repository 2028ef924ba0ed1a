package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: dominated points drop, frontier keeps all corners") {
    val pts = Seq((1.0, 5L), (2.0, 4L), (3.0, 3L), (2.0, 5L), (5.0, 1L), (4.0, 4L))
    val out = Skyline.frontier2D(pts.toDF("x", "y"), "x", "y")
      .select("x", "y").as[(Double, Long)].collect().toSet
    assert(out == Set((5.0, 1L), (4.0, 4L), (2.0, 5L)), out.toString)
  }

  test("duplicates aggregate into n_pts; nulls are ignored") {
    val pts = Seq((1.0, 1L), (1.0, 1L), (1.0, 1L)).toDF("x", "y")
      .union(Seq((null.asInstanceOf[java.lang.Double], 9L)).toDF("x", "y"))
    val out = Skyline.frontier2D(pts, "x", "y")
      .as[(Double, Long, Long)].collect()
    assert(out.toSeq == Seq((1.0, 1L, 3L)))
  }

  test("sweep equals the quadratic dominance definition on pseudo-random data") {
    val rnd = (1 to 400).map { i =>
      (((i * 7919) % 83).toDouble, ((i * 104729) % 59).toLong)
    }
    val got = Skyline.frontier2D(rnd.toDF("x", "y").repartition(7), "x", "y")
      .select("x", "y").as[(Double, Long)].collect().toSet
    val pts = rnd.distinct
    val want = pts.filter { case (x, y) =>
      !pts.exists { case (x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet
    assert(got == want)
  }
}
