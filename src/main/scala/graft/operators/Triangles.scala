package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an edge table — the fourth member of the
  * iterative-shuffle graph family ([[Components]], [[PageRank]],
  * [[LabelProp]]), except triangles need no iteration: two edge-keyed
  * joins close every wedge.
  *
  * The graph is canonicalized to an undirected simple graph with edges
  * oriented low-id -> high-id (`a < b`); a triangle is then exactly one
  * ordered tuple `a < b < c` with edges (a,b), (b,c), (a,c) — each
  * triangle is found once, no /6 correction, and the enumeration is
  * replayable in plain SQL.
  *
  * Scale shape: `distinct` on the canonical edges (one shuffle), a
  * wedge join keyed on the middle vertex, and a closing join keyed on
  * (a, c) — all edge/wedge-sized hash joins, nothing quadratic in the
  * node count. The id-order orientation is what makes the oracle
  * deterministic; at 100 TB orient by (degree, id) instead — wedge
  * counts are then bounded by sum(min-degree^2), the classic skew
  * guard for power-law graphs — and the count is unchanged because
  * any total order on vertices yields the same triangle set.
  */
object Triangles {

  /** @return (node, n_tri): for every vertex of the canonical graph,
    *         the number of triangles it participates in (vertices in no
    *         triangle report 0).
    */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val wedges = e // (a,b) join (b,c): a < b < c by orientation
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    val tri = wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    val counts = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    nodes.join(counts, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
