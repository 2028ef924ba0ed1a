package graft.operators

import graft.SparkSpec
import graft.sources.{Scratch, SnapshotStore}
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("refresh == recompute, and the delta only touches its own key dirs") {
    val root = Scratch.processScoped("incagg_spec", sf()) + "/mv"
    Scratch.deleteRecursively(new java.io.File(root))
    val st = new SnapshotStore(spark, root)
    val day1 = Seq(("d1", 10L), ("d1", 20L), ("d2", 5L)).toDF("d", "v")
    val day2 = Seq(("d2", 7L), ("d3", 100L)).toDF("d", "v") // add + insert
    IncrementalAgg.refresh(st, "mv", day1, "d", Seq("v"))
    IncrementalAgg.refresh(st, "mv", day2, "d", Seq("v"))
    val got = st.read("mv").select("d", "n", "sum_v")
      .as[(String, Long, Long)].collect()
      .map { case (d, n, s) => d -> (n, s) }.toMap
    assert(got == Map("d1" -> (2L, 30L), "d2" -> (2L, 12L), "d3" -> (1L, 100L)))
    // version history: create + merge
    assert(st.versions("mv") == Seq(1L, 2L))
  }

  test("retractions: counts subtract, zeroed keys DELETE from the view") {
    val root = Scratch.processScoped("incagg_spec", sf()) + "/mv4"
    Scratch.deleteRecursively(new java.io.File(root))
    val st = new SnapshotStore(spark, root)
    val b1 = Seq(("a", 10L, 1), ("a", 20L, 1), ("b", 5L, 1)).toDF("d", "v", "op")
    IncrementalAgg.refreshWithRetractions(st, "mv", b1, "d", Seq("v"))
    // retract one 'a' fact, ALL of 'b', insert a new key 'c'
    val b2 = Seq(("a", 20L, -1), ("b", 5L, -1), ("c", 7L, 1)).toDF("d", "v", "op")
    IncrementalAgg.refreshWithRetractions(st, "mv", b2, "d", Seq("v"))
    val got = st.read("mv").select("d", "n", "sum_v")
      .as[(String, Long, Long)].collect()
      .map { case (d, n, s) => d -> (n, s) }.toMap
    // 'b' reached zero and is GONE, not a dead zero row
    assert(got == Map("a" -> (1L, 10L), "c" -> (1L, 7L)))
  }

  test("join MV: fact appends and dim updates both equal the one-shot join") {
    val root = Scratch.processScoped("incagg_spec", sf()) + "/mv5"
    Scratch.deleteRecursively(new java.io.File(root))
    val st = new SnapshotStore(spark, root)
    val dim = Seq((1L, "X"), (2L, "Y")).toDF("ck", "seg")
    val f1 = Seq((10L, 1L, 100L), (11L, 2L, 200L)).toDF("k", "ck", "v")
    val f2 = Seq((12L, 1L, 300L)).toDF("k", "ck", "v")
    IncrementalAgg.refreshJoinFacts(st, "mv", f1, dim, "k", "ck")
    IncrementalAgg.refreshJoinFacts(st, "mv", f2, dim, "k", "ck")
    // SCD-1 update: customer 1 re-segmented; only its rows rewrite
    IncrementalAgg.refreshJoinDim(st, "mv",
      Seq((1L, "Z")).toDF("ck", "seg"), "k", "ck")
    val got = st.read("mv").select("k", "seg")
      .as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "Z", 11L -> "Y", 12L -> "Z"))
    // a dim update whose keys miss a dir's fact-id range carries that
    // dir by name (no rewrite): check version count only grew by one
    assert(st.versions("mv").size == 3)
  }

  test("a delta disjoint from stored keys carries every old dir by name") {
    val root = Scratch.processScoped("incagg_spec", sf()) + "/mv2"
    Scratch.deleteRecursively(new java.io.File(root))
    val st = new SnapshotStore(spark, root)
    IncrementalAgg.refresh(st, "mv", Seq(("a", 1L)).toDF("d", "v"), "d", Seq("v"))
    val v2 = IncrementalAgg.refresh(st, "mv", Seq(("z", 2L)).toDF("d", "v"), "d", Seq("v"))
    // the v1 dir must survive untouched in the v2 manifest (merge
    // classified it un-overlapping and never rewrote it)
    val v1Dirs = st.manifestDirs("mv", Some(1L))
    assert(st.manifestDirs("mv", Some(v2)).toSet.intersect(v1Dirs.toSet) == v1Dirs.toSet)
  }

  test("sketch refresh: incremental distinct estimates match exact at test cardinalities") {
    import org.apache.spark.sql.functions._
    val root = Scratch.processScoped("incagg_spec", sf()) + "/mv3"
    Scratch.deleteRecursively(new java.io.File(root))
    val st = new SnapshotStore(spark, root)
    // overlapping members across batches: d1 sees u1..u40 then u21..u60
    // (true distinct 60); d2 only in batch 2
    val b1 = (1 to 40).map(i => ("d1", s"u$i")).toDF("d", "u")
    val b2 = ((21 to 60).map(i => ("d1", s"u$i")) ++
      (1 to 10).map(i => ("d2", s"v$i"))).toDF("d", "u")
    IncrementalAgg.refreshDistinctSketch(st, "mv", b1, "d", "u")
    IncrementalAgg.refreshDistinctSketch(st, "mv", b2, "d", "u")
    val got = st.read("mv")
      .select(col("d"), col("n"),
        hll_sketch_estimate(col("sk")).cast("long").as("est"))
      .as[(String, Long, Long)].collect()
      .map { case (d, n, e) => d -> (n, e) }.toMap
    // HLL is exact in sparse mode at these cardinalities
    assert(got == Map("d1" -> (80L, 60L), "d2" -> (10L, 10L)))
  }

  test("sketch refresh: union state equals a one-shot sketch of all facts") {
    import org.apache.spark.sql.functions._
    val root = Scratch.processScoped("incagg_spec", sf()) + "/mv4"
    Scratch.deleteRecursively(new java.io.File(root))
    val st = new SnapshotStore(spark, root)
    val all = (1 to 500).map(i => ("d", s"u${i % 123}")).toDF("d", "u")
    val (b1, b2) = ((1 to 250).map(i => ("d", s"u${i % 123}")).toDF("d", "u"),
      (251 to 500).map(i => ("d", s"u${i % 123}")).toDF("d", "u"))
    IncrementalAgg.refreshDistinctSketch(st, "mv", b1, "d", "u")
    IncrementalAgg.refreshDistinctSketch(st, "mv", b2, "d", "u")
    val inc = st.read("mv")
      .select(hll_sketch_estimate(col("sk")).cast("long")).as[Long].head()
    val oneShot = all
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).cast("long"))
      .as[Long].head()
    assert(inc == oneShot)
    assert(inc == 123L)
  }
}
