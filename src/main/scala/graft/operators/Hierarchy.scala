package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parent-pointer hierarchy flattening — the `WITH RECURSIVE` shape
  * (org charts, category trees, bill-of-materials) Spark SQL has no
  * native operator for. Re-expressed as a bounded iterative join: each
  * round advances every unfinished node one ancestor hop, so the loop
  * runs `depth(tree)` rounds, not `|nodes|`.
  *
  * A node is finished when its current ancestor has no parent row —
  * that ancestor is its root. Rounds stop early when every walk has
  * finished (one cheap `isEmpty` on the frontier), with `maxDepth` as
  * the cycle guard: a malformed edge set with a cycle would otherwise
  * loop forever, so hitting `maxDepth` throws rather than silently
  * truncating paths.
  *
  * Scale shape per round: one equi-join of the live frontier against
  * the edge table keyed on the ancestor (shuffle bounded by the
  * frontier, which only shrinks), and the edge side can be bucketed on
  * `childCol` to make every round zero-exchange on that side.
  * `localCheckpoint` per round stops lineage growth (the [[Components]]
  * lesson). For pathological depths (linked lists), pointer-jumping
  * doubling ([[Components]]' device) cuts rounds to O(log depth) at the
  * cost of materializing ancestor-of-ancestor edges; real hierarchies
  * are shallow, so the plain hop loop is the default.
  */
object Hierarchy {

  /** @param edges adjacency rows (childCol, parentCol); roots simply
    *              have no row.
    * @return (node, root, depth, path_csv): every node that appears as
    *         a child or parent, its root ancestor, hop count to it, and
    *         the node->root id path as CSV.
    */
  def flatten(edges: DataFrame, childCol: String, parentCol: String,
              maxDepth: Int): DataFrame = {
    val e = edges.select(col(childCol).as("child"), col(parentCol).as("parent"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("child").as("node"))
      .union(e.select(col("parent").as("node"))).distinct()
    // (node, anc, depth, path); a row is live while anc still has a parent
    var walk = nodes.select(col("node"), col("node").as("anc"),
      lit(0).as("depth"), col("node").cast("string").as("path_csv"))
    var done = walk.limit(0) // union is positional: pin the output names here
      .select(col("node"), col("anc").as("root"), col("depth"), col("path_csv"))
    var hops = 0
    while (hops <= maxDepth && !walk.isEmpty) {
      if (hops == maxDepth)
        throw new IllegalStateException(
          s"hierarchy deeper than maxDepth=$maxDepth (cycle?)")
      val step = walk.join(e.withColumnRenamed("child", "anc"), Seq("anc"), "left")
        .localCheckpoint()
      done = done.union(
        step.where(col("parent").isNull)
          .select(col("node"), col("anc").as("root"), col("depth"), col("path_csv")))
      walk = step.where(col("parent").isNotNull)
        .select(col("node"), col("parent").as("anc"),
          (col("depth") + 1).as("depth"),
          concat_ws(",", col("path_csv"), col("parent")).as("path_csv"))
      hops += 1
    }
    done.select(col("node"), col("root"), col("depth").cast("long").as("depth"),
      col("path_csv"))
  }
}
