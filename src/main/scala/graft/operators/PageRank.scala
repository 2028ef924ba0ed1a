package graft.operators

import graft.functions.NumFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge table — the canonical iterative-shuffle
  * workload class (the [[Components]] pattern with numeric state).
  * Simple-graph semantics: duplicate edges collapse, each iteration is
  *   rank'(v) = (1 − d)/N + d · Σ_{(u,v)∈E} rank(u)/outdeg(u)
  * (dangling mass is dropped, the common simplified variant).
  *
  * Scale shape per iteration: one edge⋈rank join keyed on src, one
  * dst-keyed partial-combined sum — edge-set-sized shuffles only, the
  * node table is never widened; `localCheckpoint` per iteration keeps
  * the plan from growing with the iteration count (the Components
  * lesson). Ranks pass through `stableRound` each iteration, so the
  * whole trajectory is decimal-pinned and a SQL oracle replays the
  * unrolled iterations hash-exactly despite order-dependent double
  * sums (the KMeans.fit stableScale device).
  */
object PageRank {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int, damping: Double = 0.85,
          stableScale: Int = 9): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var it = 0
    while (it < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("m"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          NumFns.stableRound(
            lit((1 - damping) / n) + lit(damping) * coalesce(col("m"), lit(0.0)),
            stableScale).as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks
  }
}
