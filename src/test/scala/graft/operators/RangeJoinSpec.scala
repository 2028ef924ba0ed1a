package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // key 1: a=[0,10) overlaps b=[5,8) and touches-but-misses b=[10,12);
  // key 2: same interval ids never cross keys
  private val left = Seq(
    (1L, 100L, 0L, 10L), (1L, 101L, 20L, 25L), (2L, 102L, 0L, 10L))
  private val right = Seq(
    (1L, 200L, 5L, 8L), (1L, 201L, 10L, 12L), (1L, 202L, 24L, 40L),
    (2L, 203L, 9L, 30L))

  private def run(binWidth: Long) = RangeJoin.overlapJoin(
    left.toDF("k", "id", "s", "e"), right.toDF("k", "id", "s", "e"),
    "k", "id", "s", "e", "k", "id", "s", "e", binWidth)
    .select("a_id", "b_id", "ov_start", "ov_end", "ov_len")
    .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq

  private val expected = Seq(
    (100L, 200L, 5L, 8L, 3L),   // contained
    (101L, 202L, 24L, 25L, 1L), // partial
    (102L, 203L, 9L, 10L, 1L))  // cross-key isolation: 102 never meets 200

  test("half-open overlap semantics: containment, partial, touch-misses") {
    assert(run(binWidth = 10L) == expected)
  }

  test("bin width does not change results (pairs spanning many bins dedup)") {
    assert(run(binWidth = 3L) == expected)
    assert(run(binWidth = 100L) == expected)
  }

  test("empty and inverted intervals are dropped, not matched") {
    val bad = Seq((1L, 300L, 7L, 7L), (1L, 301L, 9L, 2L)).toDF("k", "id", "s", "e")
    val out = RangeJoin.overlapJoin(bad, right.toDF("k", "id", "s", "e"),
      "k", "id", "s", "e", "k", "id", "s", "e", 10L)
    assert(out.count() == 0)
  }
}
