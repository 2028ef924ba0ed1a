package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("labels every node with its component's min id") {
    // two components: chain {1-2-3-4} and triangle {10,11,12}
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("clusters summarizes representative and size per component") {
    val edges = Seq((5L, 6L), (8L, 7L), (7L, 9L)).toDF("a", "b")
    val got = Components.clusters(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 2L, 7L -> 3L))
  }

  test("incrementalComponents equals full components over the union") {
    // stored: {1,2,3} (comp 1), {10,11} (comp 10), isolated 20
    val batch1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val stored = Components.connectedComponents(batch1, "a", "b")
      .union(Seq((20L, 20L)).toDF("id", "comp"))
    // new batch BRIDGES the two stored comps (3-10), attaches a brand-new
    // node to a stored one (11-30), and adds an unrelated new pair (40-41)
    val batch2 = Seq((3L, 10L), (11L, 30L), (40L, 41L)).toDF("a", "b")
    val got = Components.incrementalComponents(stored, batch2, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      30L -> 1L, 20L -> 20L, 40L -> 40L, 41L -> 40L))
    // equivalence with the one-shot computation over all edges
    val full = Components.connectedComponents(batch1.union(batch2), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((got - 20L) == full) // 20 has no edge; full never sees it
  }

  test("null-endpoint edges are dropped identically on both paths") {
    val edges = Seq((Some(1L), Some(2L)), (None, Some(5L)), (Some(7L), None),
      (Some(2L), Some(3L))).toDF("a", "b")
    val local = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val dist = Components.connectedComponents(edges, "a", "b", localLimit = 0)
      .as[(Long, Long)].collect().toMap
    // nodes 5 and 7 only appear on null edges: absent entirely
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(dist == local)
  }

  test("incrementalComponentsDelta upserted into the store equals the full incremental result") {
    val batch1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val stored = Components.connectedComponents(batch1, "a", "b")
      .union(Seq((20L, 20L)).toDF("id", "comp"))
    val batch2 = Seq((3L, 10L), (11L, 30L), (40L, 41L)).toDF("a", "b")
    val full = Components.incrementalComponents(stored, batch2, "a", "b")
      .as[(Long, Long)].collect().toMap
    val delta = Components.incrementalComponentsDelta(stored, batch2, "a", "b")
      .as[(Long, Long)].collect().toMap
    // the delta is exactly the changed stored rows ({10,11} remap to 1)
    // plus the brand-new nodes — never the untouched corpus
    assert(delta == Map(10L -> 1L, 11L -> 1L, 30L -> 1L, 40L -> 40L, 41L -> 40L))
    // and upserting it over the stored labeling reproduces the full result
    val upserted = stored.as[(Long, Long)].collect().toMap ++ delta
    assert(upserted == full)
    // bounded-local and distributed delta paths agree
    val deltaDist = Components.incrementalComponentsDelta(stored, batch2,
      "a", "b", localLimit = 0).as[(Long, Long)].collect().toMap
    assert(deltaDist == delta)
  }

  test("incrementalComponents chains across batches like one-shot over the union") {
    val batches = Seq(
      Seq((1L, 2L), (5L, 6L)),            // {1,2} {5,6}
      Seq((2L, 3L), (7L, 8L)),            // grow {1,2,3}, new {7,8}
      Seq((3L, 5L), (8L, 9L), (6L, 7L)))  // merge everything into {1..9}
      .map(_.toDF("a", "b"))
    var labels = Components.connectedComponents(batches.head, "a", "b")
    for (b <- batches.tail)
      labels = Components.incrementalComponents(labels, b, "a", "b")
    val got = labels.as[(Long, Long)].collect().toMap
    val full = Components.connectedComponents(
      batches.reduce(_ union _), "a", "b").as[(Long, Long)].collect().toMap
    assert(got == full)
    assert(got.values.toSet == Set(1L))
  }

  test("incrementalComponents with an empty new batch is the identity") {
    val stored = Seq((1L, 1L), (2L, 1L), (5L, 5L)).toDF("id", "comp")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = Components.incrementalComponents(stored, empty, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
  }

  test("converges on a long chain within the round budget (distributed path forced)") {
    // path 0-1-2-...-30: worst-case diameter for min propagation;
    // localLimit = 0 forces the label-propagation path the driver
    // fast path would otherwise absorb
    val edges = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b", localLimit = 0)
      .as[(Long, Long)].collect()
    assert(got.length == 31 && got.forall(_._2 == 0L))
  }

  test("driver and distributed paths agree on the same graphs") {
    // self-loops deliberately kept: both paths must treat (a, a) as a
    // plain node mention
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(120)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .toDF("a", "b")
    val local = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val dist = Components.connectedComponents(edges, "a", "b", localLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
  }

  test("matches a reference union-find on seeded random graphs") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val nNodes = 40 + trial * 30
      val nEdges = 25 + trial * 40
      val edges = Seq.fill(nEdges) {
        (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }
      // reference: path-compressed union-find, then min id per root
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val minOfRoot = nodes.groupBy(n => find(n.toInt)).map { case (r, ns) => r -> ns.min }
      val want = nodes.map(n => n -> minOfRoot(find(n.toInt))).toMap
      val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("duplicate and reversed edges do not change the result") {
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val e2 = Seq((2L, 1L), (1L, 2L), (3L, 2L), (2L, 3L)).toDF("a", "b")
    assert(Components.connectedComponents(e1, "a", "b").as[(Long, Long)].collect().sorted
      .sameElements(Components.connectedComponents(e2, "a", "b").as[(Long, Long)].collect().sorted))
  }

  test("REAL corpus pair graph: distributed path equals the driver path") {
    // Every test-sf graph fits the driver union-find gate, so without
    // this pin the distributed min-label path (the 100 TB path) would
    // only ever run on synthetic toys. Force it UNDER the real
    // verified near-dup pair graph and demand label-for-label equality
    // with the driver path — the at-scale code must not rot.
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.load(spark, sf(), "documents")
      .where(col("text").isNotNull).select(col("doc_id"), col("text"))
    val pairs = Dedup.lshVerifiedPairs(docs, "doc_id", "text",
        estThreshold = 0.3, jaccardThreshold = 0.4)
      .select(col("a_id"), col("b_id")).localCheckpoint()
    assert(pairs.count() > 0, "corpus must yield verified pairs")
    val local = Components.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    val dist = Components.connectedComponents(pairs, "a_id", "b_id",
        localLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist == local)
    // and the incremental delta's distributed branch on the same graph
    val stored = Components.connectedComponents(
      pairs.limit(3), "a_id", "b_id")
    val deltaLocal = Components.incrementalComponentsDelta(stored, pairs,
      "a_id", "b_id").as[(Long, Long)].collect().toMap
    val deltaDist = Components.incrementalComponentsDelta(stored, pairs,
      "a_id", "b_id", localLimit = 0).as[(Long, Long)].collect().toMap
    assert(deltaDist == deltaLocal)
  }
}
