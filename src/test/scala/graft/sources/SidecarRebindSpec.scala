package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RENAME COLUMN keeps data skipping TIGHT: the per-dir stats/bloom
  * sidecars rebind old→new inside the rename operation, so range/box/
  * point pruning on the new name skips exactly what the old name
  * skipped — and compactSmall consolidates mixed-era dirs under the
  * post-rename names with complete stats (the applyRenames rule every
  * rewrite path follows).
  */
class SidecarRebindSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshStore(): SnapshotStore = {
    n += 1
    val root = Scratch.processScoped("sidecar_rebind_spec", "spec") + s"/case$n"
    new SnapshotStore(spark, root)
  }

  test("range-stats sidecars rebind: identical skip sets before and after a rename") {
    val st = freshStore()
    // three dirs with disjoint recorded ranges on `a`
    Seq(0L, 100L, 200L).foreach { lo =>
      st.commit("t", (lo until lo + 100L).map(k => (k, k * 2)).toDF("k", "a"),
        overwrite = false, statsCols = Seq("k", "a"))
    }
    val (keep0, skip0) = st.pruneDirs("t", "a", "0", "150")
    assert(skip0.size == 2 && keep0.size == 1, s"setup: $skip0 / $keep0")
    st.renameColumn("t", "a", "b")
    val (keep1, skip1) = st.pruneDirs("t", "b", "0", "150")
    assert(skip1.toSet == skip0.toSet && keep1.toSet == keep0.toSet,
      s"rebound skip must be identical: $skip1 vs $skip0")
    // the OLD name no longer has stats anywhere — a time-travel read
    // under the old spelling is conservative (keeps all), never wrong
    val (keepOld, skipOld) = st.pruneDirs("t", "a", "0", "150")
    assert(skipOld.isEmpty && keepOld.size == 3)
    // content unchanged, both eras coalesce under the new name
    assert(st.read("t").agg(sum("b")).head().getLong(0) ==
      (0L until 300L).map(_ * 2).sum)
  }

  test("bloom sidecars rebind: point-lookup skipping stays tight across a rename") {
    val st = freshStore()
    Seq(0L, 1000L).foreach { lo =>
      st.commit("t", (lo until lo + 100L).map(k => (k, s"v$k")).toDF("id", "v"),
        overwrite = false, statsCols = Seq("id"), bloomCols = Seq("id"))
    }
    val (keep0, skip0) = st.pruneDirsEq("t", "id", 5L)
    assert(skip0.nonEmpty, s"setup: bloom must skip the non-holding dir: $keep0")
    st.renameColumn("t", "id", "doc_id")
    val (keep1, skip1) = st.pruneDirsEq("t", "doc_id", 5L)
    assert(skip1.toSet == skip0.toSet && keep1.toSet == keep0.toSet,
      s"bloom rebind must keep the probe tight: $skip1 vs $skip0")
    assert(st.read("t").where(col("doc_id") === 5L).count() == 1L)
  }

  test("mergeInto's copy-on-write skipping stays tight on the renamed key") {
    val st = freshStore()
    Seq(0L, 100L, 200L).foreach { lo =>
      st.commit("t", (lo until lo + 100L).map(k => (k, 1.0)).toDF("k", "p"),
        overwrite = false, statsCols = Seq("k"))
    }
    st.renameColumn("t", "k", "key")
    val dirs0 = st.manifestDirs("t")
    st.mergeInto("t", Seq((50L, 9.0)).toDF("key", "p"), "key",
      statsCols = Seq("key"))
    // only the [0,100) dir was rewritten — the other two carried by name
    val carried = st.manifestDirs("t").toSet & dirs0.toSet
    assert(carried.size == 2,
      s"rename must not widen the merge's touched set: carried=$carried")
    assert(st.read("t").where(col("key") === 50L).select("p")
      .as[Double].head() == 9.0)
    assert(st.read("t").count() == 300L)
  }

  test("a rename retried after a partial rebind is a no-op, not a corruption") {
    val st = freshStore()
    st.commit("t", (0L until 10L).map(k => (k, k)).toDF("k", "a"),
      overwrite = true, statsCols = Seq("k", "a"))
    st.renameColumn("t", "a", "b")
    // second rename b -> c: the sidecar now holds `b` lines; rebinding
    // again must move b -> c exactly once and leave k intact
    st.renameColumn("t", "b", "c")
    val (_, skip) = st.pruneDirs("t", "c", "100", "200")
    assert(skip.size == 1, "chained renames keep the stats reachable")
    assert(st.read("t").columns.toSet == Set("k", "c"))
  }

  test("compactSmall consolidates mixed-era dirs under the POST-rename names") {
    val st = freshStore()
    // two small pre-rename dirs (physical column `a`)
    st.commit("t", (0L until 50L).map(k => (k, k * 2)).toDF("k", "a"),
      overwrite = false, statsCols = Seq("k", "a"))
    st.commit("t", (50L until 100L).map(k => (k, k * 2)).toDF("k", "a"),
      overwrite = false, statsCols = Seq("k", "a"))
    st.renameColumn("t", "a", "b")
    // one small post-rename dir (physical column `b`)
    st.commit("t", (100L until 150L).map(k => (k, k * 2)).toDF("k", "b"),
      overwrite = false, statsCols = Seq("k", "b"))
    val v = st.compactSmall("t", smallBytes = 1L << 30, statsCols = Seq("k", "b"))
    assert(st.manifestDirs("t", Some(v)).size == 1, "all three consolidated")
    // the consolidated dir is PHYSICALLY post-rename: old-era values
    // must surface under `b` with complete stats — a keyed merge that
    // trusts the stats must see them
    val (keep, _) = st.pruneDirs("t", "b", "0", "10")
    assert(keep.size == 1)
    assert(st.read("t").agg(sum("b")).head().getLong(0) ==
      (0L until 150L).map(_ * 2).sum)
    st.mergeInto("t", Seq((10L, -1L)).toDF("k", "b"), "k", statsCols = Seq("k"))
    assert(st.read("t").where(col("k") === 10L).select("b")
      .as[Long].head() == -1L)
  }
}
