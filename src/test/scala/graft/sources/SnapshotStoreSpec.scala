package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshStore(): (SnapshotStore, String) = {
    n += 1
    val root = Scratch.processScoped("snapstore_spec", "spec") + s"/case$n"
    (new SnapshotStore(spark, root), root)
  }

  test("overwrite replaces, append chains, time travel reads history") {
    val (st, _) = freshStore()
    assert(st.versions("t").isEmpty)
    assert(st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true) == 1L)
    assert(st.commit("t", Seq((2, "b")).toDF("k", "v"), overwrite = false) == 2L)
    assert(st.commit("t", Seq((9, "z")).toDF("k", "v"), overwrite = true) == 3L)
    assert(st.versions("t") == Seq(1L, 2L, 3L))
    def ks(v: Long) = st.read("t", Some(v)).select("k").as[Int].collect().toSet
    assert(ks(1L) == Set(1))
    assert(ks(2L) == Set(1, 2))
    assert(ks(3L) == Set(9))
    // latest = v3
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(9))
  }

  test("a resolved reader is isolated from later commits") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    val reader = st.read("t") // resolves the v1 manifest now
    st.commit("t", Seq((2, "b")).toDF("k", "v"), overwrite = true) // v2 replaces
    // the pre-commit reader still sees the v1 snapshot, torn by nothing
    assert(reader.select("k").as[Int].collect().toSet == Set(1))
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(2))
  }

  test("two writers from the same base: one wins, one gets a conflict") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    // writers A and B both observed base v1; A lands v2, B must conflict
    // instead of silently clobbering or double-appending
    st.commit("t", Seq((2, "b")).toDF("k", "v"),
      overwrite = false, expectedBase = Some(1L))
    val ex = intercept[RuntimeException] {
      st.commit("t", Seq((3, "c")).toDF("k", "v"),
        overwrite = false, expectedBase = Some(1L))
    }
    assert(ex.getMessage.contains("expected base"), ex.getMessage)
    // the loser retries from the fresh base and succeeds
    assert(st.commit("t", Seq((3, "c")).toDF("k", "v"),
      overwrite = false, expectedBase = Some(2L)) == 3L)
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2, 3))
  }

  test("hammered concurrent appends: every commit lands once, versions stay contiguous") {
    val (st, _) = freshStore()
    st.commit("t", Seq((0, "seed")).toDF("k", "v"), overwrite = true)
    // 4 real writer threads x 3 appends each, all racing through the
    // optimistic loop: observe base -> commit(expectedBase) -> on
    // conflict re-read and retry. ACID claim under test: no append is
    // lost, none lands twice, and the version chain has no holes.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (1 to 4).flatMap { w =>
      (1 to 3).map { i =>
        scala.concurrent.Future {
          val df = Seq((w * 100 + i, s"w$w-$i")).toDF("k", "v")
          var done = false
          var attempts = 0
          while (!done && attempts < 50) {
            attempts += 1
            val base = st.versions("t").max
            try { st.commit("t", df, overwrite = false, expectedBase = Some(base)); done = true }
            catch { case _: RuntimeException => () } // stale base or lost rename: retry
          }
          assert(done, s"writer $w-$i starved after $attempts attempts")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(st.versions("t") == (1L to 13L), st.versions("t").toString)
    val ks = st.read("t").select("k").as[Int].collect()
    assert(ks.length == 13) // seed + 12 appends, each exactly once
    assert(ks.toSet == Set(0) ++ (for (w <- 1 to 4; i <- 1 to 3) yield w * 100 + i))
  }

  test("compact: lossless, fewer files, history intact, version advances") {
    val (st, root) = freshStore()
    val df = (1 to 300).map(i => (i, s"v$i")).toDF("k", "v")
    st.commit("t", df.where(col("k") % 3 === 0).repartition(8), overwrite = true)
    st.commit("t", df.where(col("k") % 3 === 1).repartition(8), overwrite = false)
    st.commit("t", df.where(col("k") % 3 === 2).repartition(8), overwrite = false)
    def parquetFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      walk(new java.io.File(root, "t/data"))
    }
    val before = st.read("t").select("k").as[Int].collect().sorted.toSeq
    val filesBefore = parquetFiles().length
    assert(filesBefore >= 24, s"fragmentation setup too weak: $filesBefore")
    val v = st.compact("t")
    assert(v == 4L)
    // lossless and much less fragmented
    assert(st.read("t").select("k").as[Int].collect().sorted.toSeq == before)
    st.vacuum("t", retainVersions = 1)
    assert(parquetFiles().length < filesBefore / 4,
      s"${parquetFiles().length} vs $filesBefore")
    assert(st.read("t").select("k").as[Int].collect().sorted.toSeq == before)
  }

  test("optimizeClustered: lossless, one atomic version, box prune skips dirs") {
    val (st, _) = freshStore()
    val grid = (0 until (1 << 12)).map(i => ((i % 64).toLong, (i / 64).toLong, i))
      .toDF("x", "y", "payload")
    st.commit("t", grid.repartition(6), overwrite = true, statsCols = Seq("x", "y"))
    // unclustered: random partitions => every dir straddles the box
    val preds = Seq(("x", "10", "20"), ("y", "10", "20"))
    val (k0, s0) = st.pruneDirsBox("t", preds)
    assert(s0.isEmpty, s"random layout should not prune, skipped $s0")
    val before = st.read("t").select("payload").as[Int].collect().sorted.toSeq
    val v = st.optimizeClustered("t", "x", "y", bits = 6, targetDirs = 8,
      statsCols = Seq("x", "y"))
    assert(v == 2L) // ONE version for the whole recluster
    assert(st.read("t").select("payload").as[Int].collect().sorted.toSeq == before)
    val (k1, s1) = st.pruneDirsBox("t", preds)
    assert(s1.nonEmpty, s"clustered layout must skip dirs (kept ${k1.size})")
    // box read stays exact
    val boxed = st.readPrunedBox("t", preds)
      .where(col("x").between(10, 20) && col("y").between(10, 20))
      .count()
    assert(boxed == 11L * 11L)
    // time travel to the pre-optimize layout still works
    assert(st.read("t", Some(1L)).count() == (1 << 12))
  }

  test("deletion vectors: delete without rewrite, compose, resurrect via merge, materialize on compact") {
    val (st, _) = freshStore()
    st.commit("t", (0 until 1000).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(3), overwrite = true, statsCols = Seq("k"))
    val dirsBefore = st.manifestDirs("t").toSet
    // 1) delete 10%: same data dirs, one vector, content minus the keys
    val v2 = st.deleteWhere("t", "k", col("k") % 10 === 0)
    assert(st.manifestDirs("t", Some(v2)).toSet == dirsBefore,
      "delete must not rewrite data dirs")
    assert(st.manifestDels("t", v2).size == 1)
    assert(st.read("t").count() == 900)
    assert(st.read("t").where(col("k") % 10 === 0).isEmpty)
    // time travel: the pre-delete snapshot still has every row
    assert(st.read("t", Some(v2 - 1)).count() == 1000)
    // 2) deletes compose: second vector appends
    val v3 = st.deleteWhere("t", "k", col("k") === 1L)
    assert(st.manifestDels("t", v3).size == 2)
    assert(st.read("t").count() == 899)
    // matching nothing publishes nothing
    assert(st.deleteWhere("t", "k", col("k") === -5L) == v3)
    // 3) merge resurrects re-inserted keys and subtracts them from the
    // carried vector; other deleted keys stay deleted
    st.mergeInto("t", Seq((20L, 777L), (2000L, 1L)).toDF("k", "v"), "k",
      statsCols = Seq("k"))
    val after = st.read("t")
    assert(after.where(col("k") === 20L).head().getLong(1) == 777L)
    assert(after.where(col("k") === 30L).isEmpty, "still deleted")
    assert(after.count() == 901) // 899 + resurrected 20 + inserted 2000
    // 4) compaction materializes: vectors gone, content unchanged
    val content = after.orderBy("k").collect().map(_.toString).toSeq
    val v5 = st.compact("t", statsCols = Seq("k"))
    assert(st.manifestDels("t", v5).isEmpty)
    assert(st.read("t").orderBy("k").collect().map(_.toString).toSeq == content)
  }

  test("deleteWhereOnce: redelivered delete txns are fenced, ids survive compaction") {
    val (st, _) = freshStore()
    st.commit("t", (0 until 100).map(i => (i.toLong, i)).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k"))
    assert(st.deleteWhereOnce("t", "k", col("k") < 10, txnId = 7L).nonEmpty)
    assert(st.read("t").count() == 90)
    // redelivery: fenced, nothing moves
    val v = st.versions("t").max
    assert(st.deleteWhereOnce("t", "k", col("k") < 10, txnId = 7L).isEmpty)
    assert(st.versions("t").max == v)
    // the fence survives a compaction (txns persist in the manifest)
    st.compact("t", statsCols = Seq("k"))
    assert(st.deleteWhereOnce("t", "k", col("k") < 10, txnId = 7L).isEmpty)
    assert(st.read("t").count() == 90)
  }

  test("deletion vectors: pruned reads honor them; vacuum keeps vector dirs") {
    val (st, _) = freshStore()
    st.commit("t", (0 until 200).map(i => (i.toLong, s"p$i")).toDF("k", "v")
      .repartition(2), overwrite = true, statsCols = Seq("k"))
    st.deleteWhere("t", "k", col("k") < 50)
    assert(st.readPruned("t", "k", "0", "100").count() == 51) // 50..100
    assert(st.readPrunedEq("t", "k", 10L).isEmpty)
    assert(st.readPrunedEq("t", "k", 60L).count() == 1)
    st.vacuum("t", retainVersions = 1)
    assert(st.read("t").count() == 150, "vector must survive vacuum")
  }

  test("compactSmall: sub-threshold dirs consolidate, settled dirs carry by name") {
    val (st, _) = freshStore()
    // one big dir (10k rows), four tiny append dirs
    st.commit("t", (0 until 10000).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), overwrite = true)
    val big = st.manifestDirs("t").toSet
    (0 until 4).foreach(i => st.commit("t",
      Seq((100000 + i, "tiny")).toDF("k", "v").coalesce(1), overwrite = false))
    val before = st.read("t").count()
    val threshold = big.map(st.dirBytes("t", _)).min
    val v = st.compactSmall("t", smallBytes = threshold)
    val after = st.manifestDirs("t", Some(v))
    assert(big.subsetOf(after.toSet), s"big dir rewritten: $big vs $after")
    assert(after.size == big.size + 1, s"smalls not consolidated: $after")
    assert(st.read("t").count() == before)
    // idempotent: a second pass has at most one small dir -> no-op,
    // no version published
    assert(st.compactSmall("t", smallBytes = threshold) == v)
    assert(st.versions("t").max == v)
  }

  test("optimizeClusteredN: 3-D recluster is lossless, atomic, and box-prunes all dims") {
    val (st, _) = freshStore()
    val grid = (0 until (1 << 12)).map(i =>
      ((i % 16).toLong, ((i / 16) % 16).toLong, (i / 256).toLong, i))
      .toDF("x", "y", "z", "payload")
    st.commit("t", grid.repartition(6), overwrite = true,
      statsCols = Seq("x", "y", "z"))
    val preds = Seq(("x", "2", "5"), ("y", "2", "5"), ("z", "2", "5"))
    val (_, s0) = st.pruneDirsBox("t", preds)
    assert(s0.isEmpty, s"random layout should not prune, skipped $s0")
    val before = st.read("t").select("payload").as[Int].collect().sorted.toSeq
    val v = st.optimizeClusteredN("t", Seq("x", "y", "z"), bits = 4,
      targetDirs = 8, statsCols = Seq("x", "y", "z"))
    assert(v == 2L) // ONE version for the whole recluster
    assert(st.read("t").select("payload").as[Int].collect().sorted.toSeq == before)
    val (k1, s1) = st.pruneDirsBox("t", preds)
    assert(s1.nonEmpty, s"3-D clustered layout must skip dirs (kept ${k1.size})")
    val boxed = st.readPrunedBox("t", preds)
      .where(col("x").between(2, 5) && col("y").between(2, 5) &&
        col("z").between(2, 5)).count()
    assert(boxed == 4L * 4L * 4L)
  }

  test("optimizeClustered: NULL cluster keys route to the last range dir, losslessly") {
    val (st, _) = freshStore()
    val rows: Seq[(Option[Long], Option[Long], Int)] =
      (0 until 256).map(i => (Some((i % 16).toLong), Some((i / 16).toLong), i)) ++
        Seq((None, Some(3L), 1000), (Some(5L), None, 1001), (None, None, 1002))
    st.commit("t", rows.toDF("x", "y", "payload"), overwrite = true,
      statsCols = Seq("x", "y"))
    val before = st.read("t").select("payload").as[Int].collect().sorted.toSeq
    st.optimizeClustered("t", "x", "y", bits = 5, targetDirs = 4,
      statsCols = Seq("x", "y"))
    // lossless INCLUDING the curve-less rows: null keys have no Hilbert
    // position and are explicitly assigned to the last range dir
    assert(st.read("t").select("payload").as[Int].collect().sorted.toSeq == before)
    assert(st.read("t").where(col("x").isNull || col("y").isNull).count() == 3)
  }

  test("optimizeClustered: empty codable set degrades to a plain rewrite") {
    val (st, _) = freshStore()
    st.commit("t", Seq.empty[(Long, Long, Int)].toDF("x", "y", "payload"),
      overwrite = true)
    val v = st.optimizeClustered("t", "x", "y", bits = 6)
    assert(v == 2L && st.read("t").isEmpty)
  }

  test("compact before vacuum keeps the pre-compact version time-travelable") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v").repartition(4), overwrite = true)
    st.commit("t", Seq((2, "b")).toDF("k", "v").repartition(4), overwrite = false)
    val v = st.compact("t")
    assert(st.read("t", Some(v - 1)).select("k").as[Int].collect().toSet == Set(1, 2))
    assert(st.read("t", Some(v)).select("k").as[Int].collect().toSet == Set(1, 2))
  }

  test("vacuum drops unreferenced data dirs but keeps retained snapshots readable") {
    val (st, root) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2, "b")).toDF("k", "v"), overwrite = false)
    st.commit("t", Seq((9, "z")).toDF("k", "v"), overwrite = true)
    st.vacuum("t", retainVersions = 1)
    assert(st.versions("t") == Seq(3L))
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(9))
    // b1/b2 data dirs are gone (v3 references only its own b3-* dir)
    val dataRoot = new java.io.File(root, "t/data")
    val left = dataRoot.listFiles().map(_.getName)
    assert(left.length == 1 && left.head.startsWith("b3-"), left.mkString(","))
  }

  test("stats + readPruned: non-overlapping dirs are skipped at plan time") {
    val (st, _) = freshStore()
    // three appends with disjoint numeric key ranges + string date ranges
    for (shard <- 0 to 2)
      st.commit("t",
        (shard * 100 until shard * 100 + 100)
          .map(k => (k, f"1995-0${shard + 1}%d-${k % 28 + 1}%02d"))
          .toDF("k", "d"),
        overwrite = shard == 0, statsCols = Seq("k", "d"))
    // numeric pruning: [120, 180] hits only shard-1's dir
    val (keepN, skipN) = st.pruneDirs("t", "k", "120", "180")
    assert(keepN.length == 1 && skipN.length == 2, s"$keepN / $skipN")
    assert(st.readPruned("t", "k", "120", "180").select("k").as[Int]
      .collect().sorted.toSeq == (120 to 180))
    // lexical (date-string) pruning: February only
    val (keepS, skipS) = st.pruneDirs("t", "d", "1995-02-01", "1995-02-28")
    assert(keepS.length == 1 && skipS.length == 2, s"$keepS / $skipS")
    // exact predicate still applies within the surviving dir
    assert(st.readPruned("t", "d", "1995-02-10", "1995-02-12")
      .select("d").as[String].collect().forall(d => d >= "1995-02-10" && d <= "1995-02-12"))
    // fully-pruned range -> empty frame with the right schema, no error
    val none = st.readPruned("t", "k", "5000", "6000")
    assert(none.columns.toSeq == Seq("k", "d") && none.count() == 0)
    // a dir without stats is never skipped: append one stats-less dir
    st.commit("t", Seq((999, "1999-01-01")).toDF("k", "d"), overwrite = false)
    val (keep2, _) = st.pruneDirs("t", "k", "120", "180")
    assert(keep2.length == 2) // shard-1 + the stats-less dir
  }

  test("mergeInto: copy-on-write rewrites only key-overlapping dirs") {
    val (st, _) = freshStore()
    for (shard <- 0 to 3)
      st.commit("t",
        (shard * 100 until shard * 100 + 100).map(k => (k, k.toLong)).toDF("k", "p"),
        overwrite = shard == 0, statsCols = Seq("k"))
    val before = st.manifestDirs("t")
    assert(before.length == 4)
    // source touches only shard 1 [100,200) + inserts beyond every range
    val src = Seq((150, -1L, false), (160, -2L, false), (170, 0L, true), (1000, 42L, false))
      .toDF("k", "p", "del")
    val v = st.mergeInto("t", src, "k", deleteCol = Some("del"), statsCols = Seq("k"))
    val after = st.manifestDirs("t", Some(v))
    // shards 0/2/3 carried forward BY NAME; shard 1 replaced by one new dir
    assert(after.toSet.intersect(before.toSet) ==
      before.toSet - before(1), s"$before -> $after")
    assert(after.length == 4)
    val rows = st.read("t").as[(Int, Long)].collect().toMap
    assert(rows(150) == -1L && rows(160) == -2L) // updates
    assert(!rows.contains(170))                  // delete
    assert(rows(1000) == 42L)                    // insert
    assert(rows(50) == 50L && rows(250) == 250L && rows(399) == 399L) // untouched
    assert(rows.size == 400 - 1 + 1)
    // time travel: the pre-merge snapshot still reads the old values
    assert(st.read("t", Some(v - 1)).as[(Int, Long)].collect().toMap.apply(150) == 150L)
  }

  test("mergeInto on an empty table inserts everything (minus tombstones)") {
    val (st, _) = freshStore()
    val src = Seq((1, 10L, false), (2, 20L, true)).toDF("k", "p", "del")
    st.mergeInto("t", src, "k", deleteCol = Some("del"))
    assert(st.read("t").columns.toSeq == Seq("k", "p"))
    assert(st.read("t").as[(Int, Long)].collect().toSeq == Seq((1, 10L)))
  }

  test("diff emits insert/update/delete with pre/post payloads") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a", 10L), (2, "b", 20L), (3, "c", 30L)).toDF("k", "v", "p"),
      overwrite = true)
    st.commit("t", Seq((2, "b", 21L), (3, "c", 30L), (4, "d", 40L)).toDF("k", "v", "p"),
      overwrite = true)
    val d = st.diff("t", 1L, 2L, Seq("k"))
      .select("k", "change_type", "p_pre", "p_post")
      .as[(Int, String, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    assert(d == Seq(
      (1, "delete", Some(10L), None),
      (2, "update", Some(20L), Some(21L)),
      (4, "insert", None, Some(40L))))
  }

  test("appendOnce: a redelivered txn id is skipped, retries converge") {
    val (st, _) = freshStore()
    assert(st.appendOnce("t", Seq((1, "a")).toDF("k", "v"), txnId = 0L) == Some(1L))
    assert(st.appendOnce("t", Seq((2, "b")).toDF("k", "v"), txnId = 1L) == Some(2L))
    // the retry delivers DIFFERENT data under the same txn id — exactly
    // what a failed-after-commit foreachBatch replay looks like
    assert(st.appendOnce("t", Seq((99, "dup")).toDF("k", "v"), txnId = 1L).isEmpty)
    assert(st.appliedTxns("t") == Set(0L, 1L))
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2))
  }

  test("schema evolution: appended column reads NULL for pre-existing rows") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2, "b", 7L)).toDF("k", "v", "extra"), overwrite = false)
    val rows = st.read("t").select("k", "extra")
      .as[(Int, Option[Long])].collect().toMap
    assert(rows == Map(1 -> None, 2 -> Some(7L)))
  }

  test("appendOnce txn ids survive compaction (no double-append after OPTIMIZE)") {
    val (st, _) = freshStore()
    st.appendOnce("t", Seq((1, "a")).toDF("k", "v"), txnId = 7L)
    st.appendOnce("t", Seq((2, "b")).toDF("k", "v"), txnId = 8L)
    // an OPTIMIZE lands between the commit and its foreachBatch retry:
    // the rewrite replaces every data dir, so txn ids derived from dir
    // names would vanish — they must come from the persisted manifest
    st.compact("t")
    assert(st.appliedTxns("t") == Set(7L, 8L))
    assert(st.appendOnce("t", Seq((99, "dup")).toDF("k", "v"), txnId = 8L).isEmpty)
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2))
  }

  test("mergeIntoOnce: redelivered txn skipped, ids survive compaction and later merges") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a"), (2, "b")).toDF("k", "v"), overwrite = true)
    assert(st.mergeIntoOnce("t", Seq((2, "B"), (3, "c")).toDF("k", "v"),
      "k", txnId = 5L).nonEmpty)
    // immediate redelivery no-ops
    assert(st.mergeIntoOnce("t", Seq((2, "XX")).toDF("k", "v"),
      "k", txnId = 5L).isEmpty)
    // an OPTIMIZE between the merge and a late retry must not erase
    // the fence (txn history rides the manifest across every commit
    // kind, including mergeInto's own publishes)
    st.compact("t")
    assert(st.appliedTxns("t").contains(5L))
    assert(st.mergeIntoOnce("t", Seq((2, "YY")).toDF("k", "v"),
      "k", txnId = 5L).isEmpty)
    // a different txn still merges, and carries BOTH ids forward
    assert(st.mergeIntoOnce("t", Seq((4, "d")).toDF("k", "v"),
      "k", txnId = 6L).nonEmpty)
    assert(st.appliedTxns("t") == Set(5L, 6L))
    assert(st.read("t").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "c"), (4, "d")))
  }

  test("mergeInto on a schema-evolved table rewrites old-schema dirs as typed NULLs") {
    val (st, _) = freshStore()
    // dir 1 predates column `extra`; dir 2 carries it
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((5, "e", 7L)).toDF("k", "v", "extra"), overwrite = false)
    // source keys overlap the OLD dir (k=1), forcing its rewrite under
    // the merged 3-column schema — r6 threw AnalysisException here
    val src = Seq((1, "a2", 11L), (9, "i", 99L)).toDF("k", "v", "extra")
    st.mergeInto("t", src, "k")
    val rows = st.read("t").select("k", "v", "extra")
      .as[(Int, String, Option[Long])].collect().toSet
    assert(rows == Set((1, "a2", Some(11L)), (5, "e", Some(7L)), (9, "i", Some(99L))))
  }

  test("merge key skipping is exact for 64-bit keys beyond double precision") {
    val (st, _) = freshStore()
    // 2^53 and neighbors collapse to the same double; exact stats must
    // still classify the dirs correctly
    val base = 1L << 53
    st.commit("t", Seq((base, "lo")).toDF("k", "v"), overwrite = true,
      statsCols = Seq("k"))
    st.commit("t", Seq((base + 1L, "hi")).toDF("k", "v"), overwrite = false,
      statsCols = Seq("k"))
    val v = st.mergeInto("t", Seq((base + 1L, "HI")).toDF("k", "v"), "k",
      statsCols = Seq("k"))
    // only the dir containing base+1 is rewritten; dir 1 carried by name
    val dirs = st.manifestDirs("t", Some(v))
    assert(dirs.exists(_.startsWith("b1-")), dirs.mkString(","))
    val rows = st.read("t").as[(Long, String)].collect().toSet
    assert(rows == Set((base, "lo"), (base + 1L, "HI")))
  }

  test("bloom sidecars prune interleaved dirs that min/max stats cannot") {
    val (st, _) = freshStore()
    // both dirs span [1, 6] — range stats keep both for any probe in
    // range; only the bloom can tell them apart
    st.commit("t", Seq((1L, "a"), (3L, "c"), (5L, "e")).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k"), bloomCols = Seq("k"))
    st.commit("t", Seq((2L, "b"), (4L, "d"), (6L, "f")).toDF("k", "v"),
      overwrite = false, statsCols = Seq("k"), bloomCols = Seq("k"))
    val (kept4, skipped4) = st.pruneDirsEq("t", "k", 4L)
    assert(kept4.size == 1 && skipped4.size == 1, s"$kept4 / $skipped4")
    assert(kept4.head.startsWith("b2-"), kept4.mkString(","))
    assert(st.readPrunedEq("t", "k", 4L).select("v").as[String].collect().toSeq
      == Seq("d"))
    // out-of-range probe: min/max alone rules every dir out
    assert(st.pruneDirsEq("t", "k", 99L)._1.isEmpty)
    assert(st.readPrunedEq("t", "k", 99L).count() == 0)
    // in-range but absent: blooms may rarely false-positive a dir, but
    // the exact predicate keeps the result right regardless
    assert(st.readPrunedEq("t", "k", 6L).select("v").as[String].collect().toSeq
      == Seq("f"))
  }

  test("bloom point lookup works on string keys") {
    val (st, _) = freshStore()
    st.commit("t", Seq(("alpha", 1), ("gamma", 3)).toDF("name", "x"),
      overwrite = true, bloomCols = Seq("name"))
    st.commit("t", Seq(("beta", 2), ("delta", 4)).toDF("name", "x"),
      overwrite = false, bloomCols = Seq("name"))
    val (kept, _) = st.pruneDirsEq("t", "name", "beta")
    assert(kept.size == 1 && kept.head.startsWith("b2-"), kept.mkString(","))
    assert(st.readPrunedEq("t", "name", "beta").select("x").as[Int].collect().toSeq
      == Seq(2))
  }

  test("z-ordered dirs box-prune on BOTH dims; a linear layout prunes only its sort key") {
    val (st, _) = freshStore()
    // 16x16 grid of (x, y) points
    val grid = spark.range(256)
      .select((col("id") % 16).as("x"), expr("id div 16").as("y"))
    val zed = grid.withColumn("z",
      graft.operators.Layout.mortonCode(col("x"), col("y"), bits = 4))
    // z-layout: 4 equal-z-width dirs (each a compact quadrant-ish tile)
    for (i <- 0 to 3)
      st.commit("zt", zed.where(expr("z div 64") === i).drop("z"),
        overwrite = false, statsCols = Seq("x", "y"))
    // linear layout: 4 dirs split by x only — every dir spans all of y
    for (i <- 0 to 3)
      st.commit("lin", grid.where(expr("x div 4") === i),
        overwrite = false, statsCols = Seq("x", "y"))
    val box = Seq(("x", "2", "5"), ("y", "2", "5"))
    val (zKeep, zSkip) = st.pruneDirsBox("zt", box)
    val (lKeep, _) = st.pruneDirsBox("lin", box)
    // the z-layout skips dirs a y-only-blind linear layout cannot:
    // the box touches 1 z-tile (the low quadrant) but 2 x-stripes
    assert(zKeep.size == 1 && zSkip.size == 3, s"z kept $zKeep")
    assert(lKeep.size == 2, s"linear kept $lKeep")
    // and the read is layout-invisible
    val got = st.readPrunedBox("zt", box).as[(Long, Long)].collect().toSet
    val want = grid.where(col("x").between(2, 5) && col("y").between(2, 5))
      .as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("restore rolls back as a forward commit: zero data IO, history intact, txns fenced") {
    val (st, _) = freshStore()
    st.appendOnce("t", Seq((1, "a")).toDF("k", "v"), txnId = 5L)
    st.commit("t", Seq((9, "bad")).toDF("k", "v"), overwrite = true)
    val v3 = st.restore("t", 1L)
    assert(v3 == 3L)
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1))
    // the bad version stays time-travelable; the restored manifest
    // reuses v1's dirs byte-for-byte
    assert(st.read("t", Some(2L)).select("k").as[Int].collect().toSet == Set(9))
    assert(st.manifestDirs("t", Some(3L)) == st.manifestDirs("t", Some(1L)))
    // txn history survives the rollback: the sink retry still fences
    assert(st.appendOnce("t", Seq((99, "dup")).toDF("k", "v"), txnId = 5L).isEmpty)
  }

  test("history derives dirs/txns/overwrite per version from manifests alone") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.appendOnce("t", Seq((2, "b")).toDF("k", "v"), txnId = 7L)
    st.commit("t", Seq((9, "z")).toDF("k", "v"), overwrite = true)
    val h = st.history("t").as[(Long, Long, Long, Boolean)].collect().toSeq
      .sortBy(_._1)
    assert(h == Seq((1L, 1L, 0L, false), (2L, 2L, 1L, false),
      (3L, 1L, 1L, true)))
  }

  test("diff sees changes in a column added between the two versions") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a"), (2, "b")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((1, "a", 10L), (2, "b", 20L)).toDF("k", "v", "extra"),
      overwrite = true)
    // rows changed ONLY in the new column must surface as updates with
    // a NULL _pre for that column (r6 dropped them: payload came from
    // the fromV schema alone)
    val d = st.diff("t", 1L, 2L, Seq("k"))
      .select("k", "change_type", "extra_pre", "extra_post")
      .as[(Int, String, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    assert(d == Seq(
      (1, "update", None, Some(10L)),
      (2, "update", None, Some(20L))))
  }

  test("shallow clone: zero-copy read at asOf, then independent evolution") {
    val (st, root) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2, "b")).toDF("k", "v"), overwrite = false)
    st.commit("t", Seq((3, "c")).toDF("k", "v"), overwrite = false)
    assert(st.cloneView("t", "tc", asOf = Some(2L)) == 1L)
    // zero copy: the clone's own data root does not exist yet
    assert(!new java.io.File(root, "tc/data").exists())
    assert(st.read("tc").select("k").as[Int].collect().toSet == Set(1, 2))
    // clone append lands locally and never shows in the source
    st.commit("tc", Seq((7, "x")).toDF("k", "v"), overwrite = false)
    assert(st.read("tc").select("k").as[Int].collect().toSet == Set(1, 2, 7))
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2, 3))
    // source append after the clone never shows in the clone
    st.commit("t", Seq((4, "d")).toDF("k", "v"), overwrite = false)
    assert(st.read("tc").select("k").as[Int].collect().toSet == Set(1, 2, 7))
    // clone of a clone resolves the already-foreign refs verbatim
    st.cloneView("tc", "tcc")
    assert(st.read("tcc").select("k").as[Int].collect().toSet == Set(1, 2, 7))
  }

  test("shallow clone: clone vacuum never deletes source data; compact localizes") {
    val (st, root) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2, "b")).toDF("k", "v"), overwrite = false)
    st.cloneView("t", "tc")
    st.commit("tc", Seq((7, "x")).toDF("k", "v"), overwrite = false)
    st.compact("tc") // localize: rewrite into tc's own data root
    st.vacuum("tc", retainVersions = 1)
    // source dirs intact and readable after the clone's GC
    assert(new java.io.File(root, "t/data").listFiles().length == 2)
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2))
    // localized clone survives a source vacuum that drops old versions
    st.commit("t", Seq((9, "z")).toDF("k", "v"), overwrite = true)
    st.vacuum("t", retainVersions = 1)
    assert(st.read("tc").select("k").as[Int].collect().toSet == Set(1, 2, 7))
  }

  test("shallow clone: target must be empty; stats-based skipping rides the refs") {
    val (st, _) = freshStore()
    st.commit("t", (1 to 50).map(i => (i, i)).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k"))
    st.commit("t", (51 to 100).map(i => (i, i)).toDF("k", "v"),
      overwrite = false, statsCols = Seq("k"))
    st.cloneView("t", "tc")
    intercept[IllegalArgumentException](st.cloneView("t", "tc"))
    // the clone prunes on the SOURCE dirs' stats sidecars through the refs
    val (kept, skipped) = st.pruneDirs("tc", "k", "10", "20")
    assert(kept.length == 1 && skipped.length == 1, s"$kept / $skipped")
    assert(st.readPruned("tc", "k", "10", "20")
      .select("k").as[Int].collect().sorted.toSeq == (10 to 20))
  }

  test("crashed writer leaves no trace: orphan data + tmp manifest invisible, vacuum collects") {
    val (st, root) = freshStore()
    st.commit("t", Seq((1, "a"), (2, "b")).toDF("k", "v"), overwrite = true)
    // Simulate a writer that died AFTER its data write but BEFORE the
    // link(2) publish — the only crash window commit() has (the
    // manifest itself appears atomically or not at all). Debris left
    // behind: a fully-written data dir no manifest references, plus the
    // writer's half-staged .tmp manifest naming it.
    val orphan = "b2-deadbeef"
    Seq((99, "ghost")).toDF("k", "v").write
      .parquet(s"$root/t/data/$orphan")
    val mdir = java.nio.file.Paths.get(root, "t", "_manifests")
    java.nio.file.Files.writeString(mdir.resolve(".v2crashed.tmp"),
      s"""{"dirs":["$orphan"],"txns":[]}""")
    // readers and the version chain are unaffected: tmp manifests are
    // not versions, unreferenced data is not part of any snapshot
    assert(st.versions("t") == Seq(1L))
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2))
    // the next writer's v2 lands normally — the crashed attempt holds
    // no lock and reserved nothing
    st.commit("t", Seq((3, "c")).toDF("k", "v"), overwrite = false)
    assert(st.versions("t") == Seq(1L, 2L))
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2, 3))
    // vacuum keeps every live snapshot readable and collects the orphan
    st.vacuum("t", retainVersions = 2)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "t", "data", orphan)))
    assert(st.read("t", asOf = Some(1L)).count() == 2)
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2, 3))
    // same discipline for syncpoints: a crashed publisher's tmp is not
    // a syncpoint, and the id it aimed for stays claimable
    st.publishSync(Map("t" -> 1L))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_syncpoints", ".s2crashed.tmp"),
      """{"pins":["t:1"]}""")
    assert(st.syncpoints == Seq(1L))
    assert(st.publishSync(Map("t" -> 2L)) == 2L)
    assert(st.syncPins(None) == Map("t" -> 2L))
  }

  test("syncpoint: cross-view reads pin one cycle; mid-cycle commits invisible") {
    val (st, _) = freshStore()
    val b1 = st.commit("batch", Seq((1, "b1")).toDF("k", "v"), overwrite = true)
    val s1 = st.commit("speed", Seq((9, "s1")).toDF("k", "v"), overwrite = true)
    val sp1 = st.publishSync(Map("batch" -> b1, "speed" -> s1))
    assert(sp1 == 1L && st.syncpoints == Seq(1L))
    // the speed layer runs ahead; batch recomputes — all unsynced
    st.commit("speed", Seq((10, "s2")).toDF("k", "v"), overwrite = false)
    st.commit("batch", Seq((2, "b2")).toDF("k", "v"), overwrite = true)
    def vs(view: String, id: Option[Long]) =
      st.readSync(view, id).select("v").as[String].collect().toSet
    // latest syncpoint is still sp1: BOTH views read cycle-1 state even
    // though both tables have advanced
    assert(vs("batch", None) == Set("b1") && vs("speed", None) == Set("s1"))
    // cycle 2 publishes; sp1 still time-travels to the old pair
    val sp2 = st.publishSync(Map("batch" -> 2L, "speed" -> 2L))
    assert(vs("batch", None) == Set("b2"))
    assert(vs("speed", None) == Set("s1", "s2"))
    assert(vs("batch", Some(sp1)) == Set("b1") && vs("speed", Some(sp1)) == Set("s1"))
    assert(st.syncPins(Some(sp2)) == Map("batch" -> 2L, "speed" -> 2L))
  }

  test("syncpoint: racing cycle publishers produce one winner; pins validated") {
    val (st, _) = freshStore()
    st.commit("batch", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    // a pin must name a committed version
    intercept[IllegalArgumentException](st.publishSync(Map("batch" -> 7L)))
    intercept[IllegalArgumentException](st.publishSync(Map.empty))
    st.publishSync(Map("batch" -> 1L))
    // two publishers racing from the same observed base: the second
    // link(2) publish for s2 must conflict, not silently replace
    st.commit("batch", Seq((2, "b")).toDF("k", "v"), overwrite = true)
    st.publishSync(Map("batch" -> 2L), expectedBase = Some(1L))
    intercept[st.SnapshotConflict](
      st.publishSync(Map("batch" -> 1L), expectedBase = Some(1L)))
    // a reader asking for a view the syncpoint does not pin fails loudly
    intercept[IllegalArgumentException](st.readSync("speed"))
  }

  test("hammered syncpoint publishers: ids stay contiguous, every publish lands once") {
    val (st, _) = freshStore()
    val v1 = st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // 4 cycle publishers x 3 syncpoints each through the optimistic
    // loop — same ACID claim as the hammered-appends spec, at the
    // store level: no publish lost, none doubled, no id holes
    val futures = (1 to 4).flatMap { w =>
      (1 to 3).map { i =>
        scala.concurrent.Future {
          var done = false
          var attempts = 0
          while (!done && attempts < 50) {
            attempts += 1
            val base = st.syncpoints.lastOption.getOrElse(0L)
            try { st.publishSync(Map("t" -> v1), expectedBase = Some(base)); done = true }
            catch { case _: RuntimeException => () }
          }
          assert(done, s"publisher $w-$i starved after $attempts attempts")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(st.syncpoints == (1L to 12L), st.syncpoints.toString)
  }

  test("WAP: branch writes are isolated; fast-forward publishes them atomically") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.branchCreate("t", "wip")
    val b = st.branchView("t", "wip")
    // zero-copy: the branch's v1 holds only foreign refs, no data dirs of its own
    assert(st.manifestDirs(b).forall(_.contains("/")))
    st.commit(b, Seq((2, "b")).toDF("k", "v"), overwrite = false)
    st.commit(b, Seq((3, "c")).toDF("k", "v"), overwrite = false)
    def ks(view: String) = st.read(view).select("k").as[Int].collect().toSet
    assert(ks("t") == Set(1), "main must not see branch writes")
    assert(ks(b) == Set(1, 2, 3))
    val v = st.fastForward("t", "wip")
    assert(v == 2L)
    assert(ks("t") == Set(1, 2, 3))
    // time travel across the publish still works
    assert(st.read("t", Some(1L)).select("k").as[Int].collect().toSet == Set(1))
  }

  test("WAP: fast-forward of a diverged branch refuses (OCC), deletes carry") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a"), (2, "b")).toDF("k", "v"), overwrite = true)
    st.branchCreate("t", "wip")
    val b = st.branchView("t", "wip")
    st.deleteWhere(b, "k", col("k") === 1) // branch-side DV
    st.commit("t", Seq((9, "z")).toDF("k", "v"), overwrite = false) // main moves
    intercept[RuntimeException](st.fastForward("t", "wip"))
    // re-branch from the new head: the cycle completes
    st.branchCreate("t", "wip2")
    val b2 = st.branchView("t", "wip2")
    st.deleteWhere(b2, "k", col("k") === 1)
    st.fastForward("t", "wip2")
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(2, 9))
  }

  test("WAP: fast-forward refuses when main moved by DELETE only (DV-aware OCC)") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"),
      overwrite = true)
    st.branchCreate("t", "wip")
    val b = st.branchView("t", "wip")
    st.commit(b, Seq((9, "z")).toDF("k", "v"), overwrite = false)
    // main moves by deleteWhere ONLY: identical dir set, different
    // deletion vectors — publishing the branch's branch-time dels
    // would silently resurrect k=2
    st.deleteWhere("t", "k", col("k") === 2)
    intercept[RuntimeException](st.fastForward("t", "wip"))
    def ks() = st.read("t").select("k").as[Int].collect().toSet
    assert(ks() == Set(1, 3), "main's delete must survive the refusal")
    // recovery: the branch is append-only, so rebase picks up main's
    // dels and the fast-forward then lands branch work WITHOUT
    // undoing the delete
    st.rebaseBranch("t", "wip")
    st.fastForward("t", "wip")
    assert(ks() == Set(1, 3, 9))
  }

  test("deletion vectors auto-fold: a 50-batch GDPR delete loop stays bounded") {
    val (st, _) = freshStore()
    val n = 1000
    st.commit("t", (0 until n).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      .repartition(2), overwrite = true, statsCols = Seq("k"))
    val dirsBefore = st.manifestDirs("t").toSet
    for (i <- 0 until 50)
      st.deleteWhereOnce("t", "k", col("k") === i * 7L, txnId = 100L + i)
    val v = st.versions("t").max
    assert(v == 51L)
    // the carried vector set is bounded by the fold threshold forever,
    // not by how many deletes have landed
    assert(st.manifestDels("t", v).size <= 8,
      s"unfolded: ${st.manifestDels("t", v).size} vectors after 50 deletes")
    // data dirs are never rewritten by the fold (it is key-list IO only)
    assert(st.manifestDirs("t", Some(v)).toSet == dirsBefore)
    // reads are hash-identical to the semantic content
    val expect = (0 until n).map(_.toLong).toSet --
      (0 until 50).map(_ * 7L).toSet
    assert(st.read("t").select("k").as[Long].collect().toSet == expect)
    // txn fences survive across folds
    assert(st.deleteWhereOnce("t", "k", col("k") === 0L, txnId = 100L).isEmpty)
    // time travel to a pre-fold intermediate version still resolves its
    // own (superseded) vector dirs
    assert(st.read("t", Some(26L)).count() == n - 25)
    // and the exactly-once read content at head is stable across a
    // further fold cycle
    for (i <- 50 until 60)
      st.deleteWhereOnce("t", "k", col("k") === i * 7L, txnId = 100L + i)
    assert(st.manifestDels("t", st.versions("t").max).size <= 8)
    assert(st.read("t").count() == n - 60)
  }

  test("WAP: rebase re-points an append-only branch; deletes refuse") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.branchCreate("t", "wip")
    val b = st.branchView("t", "wip")
    st.commit(b, Seq((2, "b")).toDF("k", "v"), overwrite = false)
    st.commit("t", Seq((3, "c")).toDF("k", "v"), overwrite = false)
    intercept[RuntimeException](st.fastForward("t", "wip"))
    st.rebaseBranch("t", "wip")
    def ks(view: String) = st.read(view).select("k").as[Int].collect().toSet
    assert(ks(b) == Set(1, 2, 3), "rebase keeps branch work on the new base")
    st.fastForward("t", "wip")
    assert(ks("t") == Set(1, 2, 3))
    // a branch with its own deletion vector cannot rebase
    st.branchCreate("t", "del")
    val bd = st.branchView("t", "del")
    st.deleteWhere(bd, "k", col("k") === 1)
    st.commit("t", Seq((9, "z")).toDF("k", "v"), overwrite = false)
    intercept[RuntimeException](st.rebaseBranch("t", "del"))
  }

  test("WAP: branch compaction localizes, then fast-forward carries local dirs") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.branchCreate("t", "wip")
    val b = st.branchView("t", "wip")
    st.commit(b, Seq((2, "b")).toDF("k", "v"), overwrite = false)
    st.compact(b) // branch-local rewrite: all dirs now live under the branch
    assert(st.manifestDirs(b).forall(!_.contains("/")))
    st.fastForward("t", "wip")
    // main's new head references the branch's data root (foreign refs)
    assert(st.manifestDirs("t").forall(_.contains(s"$b/data")))
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2))
    // localize main, then the branch dirs are droppable
    st.compact("t")
    assert(st.manifestDirs("t").forall(!_.contains("/")))
  }

  test("secondary index: exact pruning, DV-aware reads, conservative on rewrites") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1L, "x"), (2L, "x")).toDF("k", "c"), overwrite = true)
    st.commit("t", Seq((3L, "y")).toDF("k", "c"), overwrite = false)
    st.indexRefresh("t", "c")
    val (k1, s1) = st.indexedDirsEq("t", "c", "x")
    assert(k1.size == 1 && s1.size == 1, s"$k1 / $s1")
    def ks(v: String) = st.readIndexedEq("t", "c", v)
      .select("k").as[Long].collect().toSet
    assert(ks("x") == Set(1L, 2L) && ks("y") == Set(3L))
    assert(ks("nope") == Set.empty[Long]) // no dir holds it: zero dirs read
    // deletion vectors apply through the indexed read
    st.deleteWhere("t", "k", col("k") === 1L)
    assert(ks("x") == Set(2L))
    // a rewrite (compaction) leaves the new dir uncovered: kept
    // conservatively, rows stay correct before AND after re-refresh
    st.compact("t")
    val (k2, _) = st.indexedDirsEq("t", "c", "y")
    assert(k2.size == 1, s"compacted dir must be kept uncovered: $k2")
    assert(ks("x") == Set(2L) && ks("y") == Set(3L))
    val before = st.versions("t__idx__c").max
    st.indexRefresh("t", "c") // scans only the compacted dir
    assert(st.versions("t__idx__c").max == before + 1)
    assert(ks("x") == Set(2L) && ks("y") == Set(3L))
    // a second refresh with nothing new commits nothing
    assert(st.indexRefresh("t", "c") == before + 1)
  }

  test("secondary index auto-refresh: commit→lookup prunes without a manual refresh") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1L, "x")).toDF("k", "c"), overwrite = true)
    st.indexRefresh("t", "c")
    st.commit("t", Seq((2L, "y")).toDF("k", "c"), overwrite = false)
    st.commit("t", Seq((3L, "z")).toDF("k", "c"), overwrite = false)
    // off (default): the two new dirs are uncovered — kept
    // conservatively (the covered non-hit dir is still skipped)
    val (kOff, _) = st.indexedDirsEq("t", "c", "y")
    assert(kOff.size == 2, s"uncovered dirs must be kept: $kOff")
    spark.conf.set("spark.graft.index.autoRefresh", "true")
    try {
      // on: the consult runs the incremental refresh first, so the
      // lookup prunes to exactly the one dir holding the value
      val (kOn, sOn) = st.indexedDirsEq("t", "c", "y")
      assert(kOn.size == 1 && sOn.size == 2, s"$kOn / $sOn")
      assert(st.readIndexedEq("t", "c", "y").select("k").as[Long]
        .collect().toSet == Set(2L))
      // the refresh committed exactly once; a second consult no-ops
      val v = st.versions("t__idx__c").max
      st.indexedDirsEq("t", "c", "z")
      assert(st.versions("t__idx__c").max == v)
    } finally spark.conf.unset("spark.graft.index.autoRefresh")
  }

  test("deep clone: independent copy, DVs travel, zero-copy refs localize") {
    val (st, root) = freshStore()
    st.commit("t", Seq((1, "a"), (2, "b")).toDF("k", "v"), overwrite = true)
    st.cloneView("t", "zc") // zero-copy clone: foreign refs
    st.deleteWhere("zc", "k", col("k") === 1)
    val other = new SnapshotStore(spark, s"$root/other")
    st.deepClone(other, "zc", "t2")
    // the copy localized the foreign-ref dirs and carried the vector
    assert(other.manifestDirs("t2").forall(!_.contains("/")))
    assert(other.read("t2").select("k").as[Int].collect().toSet == Set(2))
    // fully independent both directions
    st.commit("zc", Seq((9, "z")).toDF("k", "v"), overwrite = false)
    assert(other.read("t2").count() == 1)
    other.commit("t2", Seq((7, "q")).toDF("k", "v"), overwrite = false)
    assert(st.read("zc").select("k").as[Int].collect().toSet == Set(2, 9))
  }

  test("retention expiry: dir drop + residual vector, no-op and guard rails") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "2024-01-01"), (2, "2024-01-02")).toDF("k", "d"),
      overwrite = true, statsCols = Seq("k", "d"))
    st.commit("t", Seq((3, "2024-02-01"), (4, "2024-03-01")).toDF("k", "d"),
      overwrite = false, statsCols = Seq("k", "d"))
    st.commit("t", Seq((5, "2024-04-01")).toDF("k", "d"),
      overwrite = false, statsCols = Seq("k", "d"))
    val dirs0 = st.manifestDirs("t")
    // nothing before the epoch: no-op, no version
    assert(st.expireBefore("t", "d", "2024-01-01", "k") == 3L)
    // Jan dir drops whole; Feb row leaves the straddling dir via DV
    val v = st.expireBefore("t", "d", "2024-02-15", "k")
    assert(v == 4L)
    assert(st.manifestDirs("t", Some(v)).size == dirs0.size - 1)
    assert(st.manifestDels("t", v).size == 1)
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(4, 5))
    // time travel still reads the pre-expiry snapshot
    assert(st.read("t", Some(3L)).count() == 5)
    // refuse to expire the entire table
    intercept[IllegalArgumentException](
      st.expireBefore("t", "d", "2099-01-01", "k"))
  }

  test("vacuum of main never takes dirs a live branch or clone still reads") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1, "a")).toDF("k", "v"), overwrite = true)
    st.branchCreate("t", "wip")
    st.cloneView("t", "c1")
    // main moves on: OPTIMIZE supersedes v1's dir, vacuum GCs history
    st.commit("t", Seq((2, "b")).toDF("k", "v"), overwrite = false)
    st.compact("t")
    st.vacuum("t", retainVersions = 1)
    // the branch and the clone still read their pinned v1 snapshot
    assert(st.read(st.branchView("t", "wip")).select("k").as[Int]
      .collect().toSet == Set(1))
    assert(st.read("c1").select("k").as[Int].collect().toSet == Set(1))
    // and main itself reads its compacted head
    assert(st.read("t").select("k").as[Int].collect().toSet == Set(1, 2))
  }
}
