package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class FunnelPageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel: stages require strictly later timestamps, in order") {
    val ev = Seq(
      // u1 completes the funnel in order
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // u2 clicks BEFORE viewing: click doesn't count, purchase can't either
      (2L, "click", ts(5)), (2L, "view", ts(10)), (2L, "purchase", ts(20)),
      // u3 views only
      (3L, "view", ts(1)),
      // u4 view and click at the SAME instant: strict > rejects the click
      (4L, "view", ts(7)), (4L, "click", ts(7)),
      // u5 never views: nothing counts
      (5L, "click", ts(1)), (5L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 4L, "click" -> 1L, "purchase" -> 1L), got.toString)
  }

  test("cohortRetention: users bucket by first period, distinct later activity counts") {
    val ev = Seq(
      // u1 first in period 0, active again periods 1 and 2 (twice: distinct)
      (1L, ts(10)), (1L, ts(100 + 10)), (1L, ts(200 + 10)), (1L, ts(200 + 50)),
      // u2 first in period 0 only
      (2L, ts(20)),
      // u3 first in period 2, active period 3
      (3L, ts(200 + 5)), (3L, ts(300 + 5))
    ).toDF("user_id", "ts")
    val got = Funnel.cohortRetention(ev, "user_id", "ts", periodSec = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (2L, 0L, 1L), (2L, 1L, 1L)), got.toString)
  }

  test("pagerank: hub of a star dominates; cycle is uniform; deterministic") {
    // star: 1..4 -> 0, plus 0 -> 1 so the hub isn't dangling
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)).toDF("s", "d")
    val ranks = PageRank.run(star, "s", "d", iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(ranks(0L) > ranks(1L) && ranks(1L) > ranks(2L), ranks.toString)
    assert(ranks(2L) == ranks(3L) && ranks(3L) == ranks(4L)) // symmetric leaves
    // 3-cycle: perfect symmetry => equal ranks at every iteration
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("s", "d")
    val cr = PageRank.run(cyc, "s", "d", iterations = 4)
      .as[(Long, Double)].collect().map(_._2).distinct
    assert(cr.length == 1, cr.mkString(","))
    // determinism across runs (stableRound pins the trajectory)
    val again = PageRank.run(star, "s", "d", iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(again == ranks)
  }
}
