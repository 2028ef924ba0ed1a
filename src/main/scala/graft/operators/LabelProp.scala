package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection) over an edge
  * table — the third member of the iterative-shuffle family
  * ([[Components]]: min-label convergence, [[PageRank]]: numeric
  * state). Deterministic variant: each round every node adopts the
  * most frequent label among its neighbors, ties broken by the
  * SMALLEST label (classic LPA breaks ties randomly, which no oracle
  * could replay); a fixed round count rather than convergence detection
  * keeps the trajectory finite and SQL-unrollable.
  *
  * The graph is symmetrized and de-duplicated (undirected simple
  * graph, self-loops dropped) so "neighbors" is well-defined and every
  * node in the node set has at least one neighbor.
  *
  * Scale shape per round: one edge⋈label join keyed on the neighbor
  * endpoint, one (node, label) partial-combined count, and one
  * per-node top-1 window (WindowGroupLimit — no full-group buffering).
  * Edge-set-sized shuffles only; `localCheckpoint` per round stops
  * lineage growth (the Components lesson). All state is integral, so
  * the replay is exact with no float stabilization at all.
  */
object LabelProp {

  /** @return (node, label, n_comm): each node's community label after
    *         `iterations` synchronous rounds, and its community's size.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int): DataFrame = {
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a") =!= col("b"))
    val e = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    val nodes = e.select(col("a").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var it = 0
    while (it < iterations) {
      val freq = e
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("a")).orderBy(col("cnt").desc, col("label"))
      labels = freq.withColumn("_r", row_number().over(w))
        .where(col("_r") === 1)
        .select(col("a").as("node"), col("label"))
        .localCheckpoint()
      it += 1
    }
    labels.withColumn("n_comm",
      count(lit(1)).over(Window.partitionBy(col("label"))))
  }
}
