package graft.operators

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // two 4-cliques bridged by a single edge (4-10); LPA should settle
  // each clique on its own minimum label
  private val cliqueEdges = (for {
    xs <- Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 11L, 12L, 13L))
    a <- xs; b <- xs if a < b
  } yield (a, b)) :+ (4L, 10L)

  test("cliques converge to their min label; the bridge doesn't merge them") {
    val out = LabelProp.run(cliqueEdges.toDF("src", "dst"), "src", "dst", 3)
      .select("node", "label").as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L), out.toString)
    assert(Seq(11L, 12L, 13L).forall(out(_) == 10L), out.toString)
    // the two communities stay distinct
    assert(out(2L) != out(11L))
  }

  test("n_comm matches the label multiplicity and covers every node") {
    val rows = LabelProp.run(cliqueEdges.toDF("src", "dst"), "src", "dst", 3)
      .select("node", "label", "n_comm").as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.length == 8)
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.forall(_._3 == members.length))
    }
  }

  test("deterministic under repartition; self-loops and duplicate edges are inert") {
    val noisy = (cliqueEdges ++ Seq((1L, 1L), (2L, 1L), (1L, 2L)))
      .toDF("src", "dst").repartition(7)
    val a = LabelProp.run(noisy, "src", "dst", 3)
      .select("node", "label").as[(Long, Long)].collect().sorted.toSeq
    val b = LabelProp.run(cliqueEdges.toDF("src", "dst"), "src", "dst", 3)
      .select("node", "label").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
