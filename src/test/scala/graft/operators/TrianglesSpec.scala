package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  // K4 on {1,2,3,4} (4 triangles, 3 per node) plus a pendant edge 4-9
  // and an isolated edge 20-21 (no triangles)
  private val k4 = for {
    xs <- Seq(Seq(1L, 2L, 3L, 4L)); a <- xs; b <- xs if a < b
  } yield (a, b)
  private val edges = k4 ++ Seq((4L, 9L), (20L, 21L))

  test("K4: every member sits in 3 of the 4 triangles; outsiders report 0") {
    val out = Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 3L), out.toString)
    assert(Seq(9L, 20L, 21L).forall(out(_) == 0L), out.toString)
    assert(out.size == 7)
  }

  test("orientation canonicalizes: reversed/duplicate/self-loop edges change nothing") {
    val noisy = (edges.map { case (a, b) => (b, a) } ++ edges ++ Seq((1L, 1L)))
      .toDF("src", "dst").repartition(5)
    val a = Triangles.perNode(noisy, "src", "dst")
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("triangle-free bipartite graph counts zero everywhere") {
    val bip = for (a <- Seq(1L, 2L, 3L); b <- Seq(10L, 11L)) yield (a, b)
    val out = Triangles.perNode(bip.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect()
    assert(out.length == 5 && out.forall(_._2 == 0L))
  }
}
