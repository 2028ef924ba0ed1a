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
}
