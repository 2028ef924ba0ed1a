package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated clusters. Seeds are the first k ids, so ids 1
  // (cluster A) and 2 (cluster B) are chosen deliberately one per
  // cluster. In-cell: 3/4 are planted near-dups of 1, 5 points away
  // from everything in its cell, 10 is a near-dup of 2.
  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.01f, 0.0f)), // seed, cluster A
    (2L, Array(0.0f, 1.0f, 0.0f, 0.01f)), // seed, cluster B
    (3L, Array(0.99f, 0.0f, 0.0f, 0.01f)), // dup of 1
    (4L, Array(1.0f, 0.01f, 0.0f, 0.0f)), // dup of 1
    (5L, Array(0.6f, 0.0f, -0.8f, 0.0f)), // cell A, dissimilar
    (10L, Array(0.01f, 1.0f, 0.0f, 0.0f)) // dup of 2
  ).toDF("vec_id", "embedding")

  private lazy val out =
    SemDedup.dedup(vecs, "vec_id", "embedding", k = 2, simThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("keeps the lowest-id member of each near-dup group, drops the rest") {
    val ids = out.map(_._1).toSet
    assert(ids.contains(1L) && !ids.contains(3L) && !ids.contains(4L),
      s"cluster A dups: $ids")
    assert(ids.contains(2L) && !ids.contains(10L), s"cluster B dups: $ids")
  }

  test("dissimilar cell-mates and singletons survive") {
    val ids = out.map(_._1).toSet
    assert(ids.contains(5L), s"dissimilar member dropped: $ids")
    assert(out.length == 3)
  }

  test("n_cell counts members before pruning and cells are coherent") {
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._3 == 4L) // cell A: 1,3,4,5
    assert(byId(2L)._3 == 2L) // cell B: 2,10
    assert(byId(1L)._2 == byId(5L)._2)
    assert(byId(1L)._2 != byId(2L)._2)
  }

  test("result is invariant to input partitioning") {
    val re = SemDedup.dedup(vecs.repartition(5), "vec_id", "embedding",
        k = 2, simThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(re.toSeq == out.sorted.toSeq)
  }

  test("assignment stage is a zero-shuffle projection (one Exchange total: the cell groupBy)") {
    val plan = SemDedup.dedup(vecs, "vec_id", "embedding", k = 2, simThreshold = 0.9)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected <=1 Exchange (the cell shuffle):\n$plan")
  }
}
