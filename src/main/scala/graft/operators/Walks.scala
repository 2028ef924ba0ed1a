package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk/node2vec
  * preprocessing step: walks over the graph become "sentences" an
  * embedding trainer (the skip-gram feed, q157) consumes. Walks here
  * are PSEUDO-random by construction: the neighbor picked at step t
  * from node v is indexed by a 31-bit LCG of (v, t) over v's
  * rank-ordered adjacency — deterministic, partitioning-invariant,
  * and replayable in plain SQL (the q100/q123 LCG convention; true
  * RNG walks cannot be cross-engine graded).
  *
  * Scale shape: adjacency is ranked ONCE (one window over the edge
  * list, partitioned by source); each step is one equi-join of the
  * current frontier against (degree, adjacency) — `steps` bounded
  * joins total, no driver iteration, frontier never larger than the
  * node set (one walk per start node; same-node walks at the same
  * step coincide by design). Dead-end nodes simply end their walk
  * (no self-loop padding).
  */
object Walks {

  /** (start, step, node) rows for one `steps`-long walk from every
    * node with out-degree > 0; step 0 is the start itself.
    */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
                  steps: Int): DataFrame = {
    require(steps >= 1, s"bad steps $steps")
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d")).distinct()
    // ranked adjacency and degrees materialize ONCE (localCheckpoint —
    // the iterative-join lineage cut PageRank/Components use; also what
    // keeps re-planning off every step)
    val adj = e.withColumn("_rnk",
      row_number().over(Window.partitionBy(col("_s")).orderBy(col("_d"))) - 1)
      .select(col("_s").as("node"), col("_d"), col("_rnk"))
      .localCheckpoint()
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("_deg"))
      .localCheckpoint()
    var cur = deg.select(col("node").as("start"), col("node"),
      lit(0).as("step"))
    val walks = Seq.newBuilder[DataFrame]
    walks += cur
    for (t <- 1 to steps) {
      // 31-bit LCG of (node, step): mirrors Mixer.lcg31's total
      // arithmetic (pre-reduce, multiply, reduce) — never overflows
      val seed = pmod(col("node") + lit(t.toLong * 1000003L),
        lit(2147483648L))
      val idx = pmod(pmod(seed * 1103515245L + 12345L, lit(2147483648L)),
        col("_deg"))
      cur = cur.join(deg, Seq("node"))
        .withColumn("_rnk", idx)
        .join(adj, Seq("node", "_rnk"))
        .select(col("start"), col("_d").as("node"), lit(t).as("step"))
        .localCheckpoint()
      walks += cur
    }
    walks.result().reduce(_ unionByName _)
  }

  /** node2vec-biased walks (directed variant): step 1 is the uniform
    * [[randomWalks]] pick; steps 2..`steps` weight each neighbor `nbr`
    * of the current node by its relation to the PREVIOUS node —
    * `wReturn` when `nbr == prev` (node2vec's 1/p), `wCommon` when the
    * edge prev→nbr exists (distance-1), `wFar` otherwise (1/q) — and
    * pick by inverse-CDF over the (nbr-ascending) cumulative weights
    * at an LCG-uniform threshold. DYADIC weights (0.5 / 1.0 / 0.25 by
    * default, i.e. p=2, q=4) keep every cumulative sum and the
    * threshold product exact in IEEE doubles, so the pick replays
    * bit-identically in SQL.
    *
    * Scale shape per step: one join frontier→adjacency (candidate
    * fan-out = out-degree), one broadcast-able left semi probe of the
    * edge set for the distance-1 flag, one per-walk window for the
    * cumulative weights, one first-crossing argmin. Frontier ≤ node
    * count throughout; `steps` is a small constant.
    */
  def node2vecWalks(edges: DataFrame, srcCol: String, dstCol: String,
                    steps: Int, wReturn: Double = 0.5,
                    wCommon: Double = 1.0, wFar: Double = 0.25): DataFrame = {
    require(steps >= 1, s"bad steps $steps")
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d")).distinct()
      .localCheckpoint()
    val adj = e.withColumn("_rnk",
      row_number().over(Window.partitionBy(col("_s")).orderBy(col("_d"))) - 1)
      .select(col("_s").as("node"), col("_d"), col("_rnk"))
      .localCheckpoint()
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("_deg"))
      .localCheckpoint()
    val start0 = deg.select(col("node").as("start"), col("node"),
      lit(null).cast("long").as("prev"), lit(0).as("step"))
    // step 1: uniform, exactly randomWalks' arithmetic
    val seed1 = pmod(col("node") + lit(1000003L), lit(2147483648L))
    val idx1 = pmod(pmod(seed1 * 1103515245L + 12345L, lit(2147483648L)),
      col("_deg"))
    var cur = start0.join(deg, Seq("node"))
      .withColumn("_rnk", idx1)
      .join(adj, Seq("node", "_rnk"))
      .select(col("start"), col("_d").as("node"),
        col("start").as("prev"), lit(1).as("step"))
      .localCheckpoint()
    val walks = Seq.newBuilder[DataFrame]
    walks += start0.select(col("start"), col("node"), col("step"))
    walks += cur.select(col("start"), col("node"), col("step"))
    val edgeSet = e.select(col("_s").as("_es"), col("_d").as("_ed"))
    for (t <- 2 to steps) {
      val cand = cur.join(adj, Seq("node"))
        .join(edgeSet,
          col("prev") === col("_es") && col("_d") === col("_ed"), "left")
        .withColumn("_w",
          when(col("_d") === col("prev"), lit(wReturn))
            .when(col("_es").isNotNull, lit(wCommon))
            .otherwise(lit(wFar)))
      val byNbr = Window.partitionBy(col("start")).orderBy(col("_d"))
      val seedT = pmod(col("node") + lit(t.toLong * 1000003L),
        lit(2147483648L))
      val u = (pmod(seedT * 1103515245L + 12345L, lit(2147483648L))
        .cast("double") + lit(0.5)) / lit(2147483648.0)
      val staged = cand
        .withColumn("_cum", sum(col("_w")).over(byNbr))
        .withColumn("_tot", sum(col("_w")).over(Window.partitionBy(col("start"))))
        .withColumn("_thr", u * col("_tot"))
        .where(col("_cum") >= col("_thr"))
      cur = staged
        .withColumn("_pick",
          row_number().over(Window.partitionBy(col("start")).orderBy(col("_cum"))))
        .where(col("_pick") === 1)
        .select(col("start"), col("_d").as("node"),
          col("node").as("prev"), lit(t).as("step"))
        .localCheckpoint()
      walks += cur.select(col("start"), col("node"), col("step"))
    }
    walks.result().reduce(_ unionByName _)
  }
}
