package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bfs.distances against brute-force shortest paths: multi-source min,
  * hop cap, early stop on frontier exhaustion, unreachable nodes
  * absent, revisits never shorten (level-order = min by construction).
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
                  maxHops: Int): Map[Long, Long] =
    Bfs.distances(edges.toDF("s", "t"), "s", "t",
        sources.toDF("node"), "node", maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("line graph: distances count hops; cap truncates the tail") {
    val line = (0L until 9L).map(i => (i, i + 1))
    assert(run(line, Seq(0L), 10) == (0L to 9L).map(i => i -> i).toMap)
    assert(run(line, Seq(0L), 3) == (0L to 3L).map(i => i -> i).toMap)
    assert(run(line, Seq(0L), 0) == Map(0L -> 0L))
  }

  test("multi-source takes the nearest source; unreachable nodes are absent") {
    // 0→1→2→3→4  and isolated component 10→11; sources 0 and 4
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val sym = edges ++ edges.map(_.swap)
    val got = run(sym, Seq(0L, 4L), 10)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("cycles terminate via the visited anti-join, not the hop cap") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    assert(run(cyc, Seq(0L), 100) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("matches brute-force min distance on a random graph") {
    val rng = new scala.util.Random(11)
    val edges = Seq.fill(150)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    val sources = Seq(0L, 7L)
    val maxHops = 5
    // brute force: Floyd-ish BFS per source on the driver
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def bfs(src: Long): Map[Long, Int] = {
      var dist = Map(src -> 0)
      var frontier = Set(src)
      var h = 1
      while (frontier.nonEmpty && h <= maxHops) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
        dist ++= next.map(_ -> h)
        frontier = next
        h += 1
      }
      dist
    }
    val expect = sources.flatMap(s => bfs(s).toSeq)
      .groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min.toLong }
    assert(run(edges, sources, maxHops) == expect)
  }

  test("weightedCosts: matches brute-force min cost over bounded walks") {
    val rng = new scala.util.Random(31)
    val edges = Seq.fill(120)((rng.nextInt(25).toLong, rng.nextInt(25).toLong,
      (1 + rng.nextInt(9)).toLong))
    val sources = Seq(0L, 3L)
    val maxHops = 4
    // INDEPENDENT oracle: full Bellman-Ford relaxing EVERY known node
    // each round (no frontier optimization — deliberately a different
    // algorithm than the production code, so frontier-propagation bugs
    // can't cancel out). After H rounds: min cost over <=H-edge walks.
    def brute(): Map[Long, Long] = {
      var best = sources.map(_ -> 0L).toMap
      for (_ <- 1 to maxHops) {
        val relaxed = edges.flatMap { case (s, t, w) =>
          best.get(s).map(c => t -> (c + w)) }
          .groupBy(_._1).map { case (n, cs) => n -> cs.map(_._2).min }
        best = (best.keySet ++ relaxed.keySet).map { n =>
          n -> math.min(best.getOrElse(n, Long.MaxValue),
            relaxed.getOrElse(n, Long.MaxValue))
        }.toMap
      }
      best
    }
    val got = Bfs.weightedCosts(edges.toDF("s", "t", "w"), "s", "t", "w",
        sources.toDF("node"), "node", maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute())
  }

  test("weightedCosts: parallel edges take the min; negative weights dropped") {
    val edges = Seq((1L, 2L, 9L), (1L, 2L, 4L), (2L, 3L, -5L), (2L, 3L, 2L))
      .toDF("s", "t", "w")
    val got = Bfs.weightedCosts(edges, "s", "t", "w",
        Seq(1L).toDF("node"), "node", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 4L, 3L -> 6L))
  }

  test("weightedCosts: cheaper-but-longer path wins within the hop budget") {
    // 0→9 direct cost 100; 0→1→2→9 cost 3 but needs 3 hops
    val edges = Seq((0L, 9L, 100L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 9L, 1L))
      .toDF("s", "t", "w")
    def run(h: Int) = Bfs.weightedCosts(edges, "s", "t", "w",
        Seq(0L).toDF("node"), "node", h)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1)(9L) == 100L) // only the direct edge fits
    assert(run(3)(9L) == 3L)   // the long cheap path relaxes through
  }

  test("null endpoints are dropped; empty sources yield empty output") {
    val e = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(2L), None))
      .toDF("s", "t")
    val out = Bfs.distances(e, "s", "t", Seq(1L).toDF("node"), "node", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L))
    assert(Bfs.distances(e, "s", "t",
      Seq.empty[Long].toDF("node"), "node", 3).isEmpty)
  }
}
