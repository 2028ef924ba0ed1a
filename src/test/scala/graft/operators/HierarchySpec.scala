package graft.operators

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  // two trees:  1 <- 2 <- 4, 1 <- 3   and   7 <- 8
  private val edges = Seq((2L, 1L), (4L, 2L), (3L, 1L), (8L, 7L))

  test("root, depth and path are exact; roots report themselves at depth 0") {
    val out = Hierarchy.flatten(edges.toDF("c", "p"), "c", "p", maxDepth = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(4L) == ((1L, 2L, "4,2,1")))
    assert(out(2L) == ((1L, 1L, "2,1")))
    assert(out(3L) == ((1L, 1L, "3,1")))
    assert(out(1L) == ((1L, 0L, "1")))
    assert(out(8L) == ((7L, 1L, "8,7")))
    assert(out(7L) == ((7L, 0L, "7")))
    assert(out.size == 6)
  }

  test("a cycle trips the maxDepth guard instead of looping or truncating") {
    val cyclic = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("c", "p")
    val e = intercept[IllegalStateException] {
      Hierarchy.flatten(cyclic, "c", "p", maxDepth = 6).collect()
    }
    assert(e.getMessage.contains("maxDepth"))
  }

  test("deterministic under repartition and duplicate edges") {
    val noisy = (edges ++ edges).toDF("c", "p").repartition(7)
    val a = Hierarchy.flatten(noisy, "c", "p", 5)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    val b = Hierarchy.flatten(edges.toDF("c", "p"), "c", "p", 5)
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(a == b)
  }
}
