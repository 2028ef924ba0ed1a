package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS shortest-hop distances over an edge table — the
  * frontier-expansion member of the iterative-shuffle family
  * ([[Components]] / [[PageRank]] / [[LabelProp]]). Directed-edge
  * semantics (symmetrize before calling for undirected graphs);
  * distance = fewest hops from ANY source node, capped at `maxHops`.
  *
  * Scale shape per level: one frontier⋈edges join keyed on src (the
  * frontier is the LEVEL's newly-reached nodes, never the whole
  * visited set), one dst-keyed distinct, and one anti-join against the
  * visited table to drop re-reached nodes — all shuffles are
  * O(frontier-adjacent edges) or O(visited), never O(V·E). Level-order
  * expansion makes "first reach" = "min distance" by construction, so
  * no per-node min aggregation is ever needed. The loop early-stops on
  * an empty frontier (cheap: the frontier was just materialized by
  * `localCheckpoint`, so the emptiness probe re-reads the checkpoint,
  * not the lineage), and `localCheckpoint` per level keeps the plan
  * size constant in `maxHops` — the Components lesson. Driver state is
  * O(1): only the loop counter; distances stay distributed.
  */
object Bfs {

  /** WEIGHTED shortest costs — bounded Bellman-Ford with the frontier
    * optimization: `maxHops` relax rounds, each joining only the
    * LAST round's improved nodes against the edge table (O(frontier-
    * adjacent edges) per round, like [[distances]]), per-node min by
    * partial-combined hash agg, improvement test by one anti-join-free
    * left join against the running dist table. After H rounds the
    * result is exactly min cost over walks of ≤ H edges (each round
    * extends candidate walks by one edge; late improvements re-enter
    * the frontier and propagate in later rounds) — the contract a
    * recursive-CTE oracle replays. Negative weights are out of
    * contract (dropped); parallel edges participate (min absorbs).
    *
    * @return (node, cost) — every node reachable from a source within
    *         `maxHops` edges, at its cheapest ≤-maxHops-edge cost
    */
  def weightedCosts(edges: DataFrame, srcCol: String, dstCol: String,
                    weightCol: String, sources: DataFrame, srcIdCol: String,
                    maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull && col("w") >= 0)
      .distinct().localCheckpoint()
    var dist = sources.select(col(srcIdCol).as("node")).distinct()
      .withColumn("cost", lit(0L)).localCheckpoint()
    var frontier = dist
    var h = 1
    var done = frontier.isEmpty
    while (!done && h <= maxHops) {
      val cand = e
        .join(frontier.select(col("node").as("src"), col("cost").as("_fc")),
          Seq("src"))
        .select(col("dst").as("node"), (col("_fc") + col("w")).as("_nc"))
        .groupBy(col("node")).agg(min(col("_nc")).as("_nc"))
      val improved = cand.join(dist, Seq("node"), "left")
        .where(col("cost").isNull || col("_nc") < col("cost"))
        .select(col("node"), col("_nc").as("cost"))
        .localCheckpoint()
      if (improved.isEmpty) done = true
      else {
        dist = dist.join(improved, Seq("node"), "left_anti")
          .unionByName(improved).localCheckpoint()
        frontier = improved
        h += 1
      }
    }
    dist
  }

  /** @param sources one column `srcIdCol` of starting nodes (dist 0)
    * @return (node, d) — every node within `maxHops` of a source, with
    *         its shortest hop count; sources themselves at d = 0
    */
  def distances(edges: DataFrame, srcCol: String, dstCol: String,
                sources: DataFrame, srcIdCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    var frontier = sources.select(col(srcIdCol).as("node")).distinct()
      .localCheckpoint()
    var dist = frontier.withColumn("d", lit(0L)).localCheckpoint()
    var h = 1L
    var done = frontier.isEmpty
    while (!done && h <= maxHops) {
      val next = e.join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        dist = dist.unionByName(next.withColumn("d", lit(h))).localCheckpoint()
        frontier = next
        h += 1
      }
    }
    dist
  }
}
