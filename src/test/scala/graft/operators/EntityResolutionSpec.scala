package graft.operators

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val registry = Seq(
    (1L, "acme corp", 10L),
    (2L, "acme inc", 10L),
    (3L, "zenith ltd", 10L),
    (4L, "acme corp", 20L) // same name, other block
  ).toDF("id", "name", "blk")

  private val dirty = Seq(
    (100L, "acme c0rp", 10L),  // 1 edit from "acme corp"
    (101L, "zenith", 10L),     // 4 edits from "zenith ltd"
    (102L, "completely different", 10L), // no candidate within 3
    (103L, "acme corp", 20L)   // exact, must respect the block
  ).toDF("id", "name", "blk")

  private lazy val links =
    EntityResolution.resolve(dirty, "id", "name", registry, "id", "name",
        blockCol = "blk", maxDist = 4)
      .select("d_id", "c_id", "dist").as[(Long, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("links each dirty record to the nearest in-block candidate") {
    assert(links(100L) == (1L, 1))
    assert(links(101L) == (3L, 4))
    assert(links(103L) == (4L, 0)) // block 20: only id 4 is eligible
  }

  test("records with no candidate within maxDist are dropped") {
    assert(!links.contains(102L))
  }

  test("equidistant candidates tie-break to the lower registry id") {
    val d = Seq((200L, "acme cor", 10L)).toDF("id", "name", "blk")
    // "acme cor": 1 edit from both "acme corp" (insert) and... check:
    // vs "acme corp" = 1, vs "acme inc" = 3 -> nearest unique; craft a
    // true tie instead: "acme co" is 2 from corp, 3 from inc; use
    // symmetric registry
    val reg = Seq((1L, "aa", 1L), (2L, "bb", 1L)).toDF("id", "name", "blk")
    val t = Seq((9L, "ab", 1L)).toDF("id", "name", "blk")
    val got = EntityResolution.resolve(t, "id", "name", reg, "id", "name", "blk", 4)
      .select("c_id").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("registry streams through a broadcast join (no registry shuffle before scoring)") {
    val plan = EntityResolution.resolve(dirty, "id", "name", registry, "id", "name",
        "blk", 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
