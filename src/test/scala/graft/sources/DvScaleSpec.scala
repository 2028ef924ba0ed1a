package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The deletion-vector SCALE tier: the broadcast bound on the read
  * path, the size-tiered fold, and deleteWhere's DV-vs-rewrite
  * escalation — the three guards that keep `DELETE FROM t WHERE <wide
  * predicate>` from turning every subsequent read into an unbounded
  * driver broadcast at 100 TB. Thresholds are dialed tiny here so the
  * big-table paths run on spec-sized data.
  */
class DvScaleSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshStore(): (SnapshotStore, String) = {
    n += 1
    val root = Scratch.processScoped("dvscale_spec", "spec") + s"/case$n"
    (new SnapshotStore(spark, root), root)
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A =
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally pairs.foreach { case (k, _) => spark.conf.unset(k) }

  private def seed(st: SnapshotStore, keys: Range = 0 until 4000): Long = {
    val df = keys.map(k => (k.toLong, s"v$k", k % 7)).toDF("k", "v", "m")
    st.commit("t", df.repartition(4), overwrite = true, statsCols = Seq("k"))
  }

  test("small vector sets broadcast; past dv.broadcastMaxBytes the anti-join shuffles") {
    val (st, _) = freshStore()
    seed(st)
    st.deleteWhere("t", "k", col("k") < 100)
    def antiPlan = st.read("t").queryExecution.executedPlan.toString
    // isolate OUR hint from Spark's own size-based auto-broadcast
    // (which this spec's tiny files would always trigger; at scale it
    // is size-aware and agrees with the byte bound by construction)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // default: key files are under the bound -> the HINT broadcasts
      assert(antiPlan.contains("BroadcastHashJoin") ||
        antiPlan.contains("BroadcastExchange"), antiPlan)
      withConf("spark.graft.dv.broadcastMaxBytes" -> "1") {
        val p = antiPlan
        assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
          s"past the byte bound the vector must not broadcast:\n$p")
        // and the rows stay exactly right under the shuffled plan
        assert(st.read("t").count() == 4000L - 100L)
        assert(st.read("t").agg(min(col("k"))).head().getLong(0) == 100L)
      }
    }
  }

  test("wide SQL DELETE escalates to copy-on-write: no vector, touched dirs only") {
    val (st, _) = freshStore()
    // dirs with DISJOINT key ranges so the rewrite can skip some:
    // d1 = [0,1000), d2 = [1000,2000), d3 = [2000,3000)
    val mk = (lo: Int) => (lo until lo + 1000)
      .map(k => (k.toLong, s"v$k", k % 7)).toDF("k", "v", "m")
    st.commit("t", mk(0).coalesce(1), overwrite = true, statsCols = Seq("k"))
    st.commit("t", mk(1000).coalesce(1), overwrite = false, statsCols = Seq("k"))
    st.commit("t", mk(2000).coalesce(1), overwrite = false, statsCols = Seq("k"))
    val dirsBefore = st.manifestDirs("t")
    graft.plans.GraftTableRegistry.register("dv_esc", st, "t", "k")
    withConf("spark.graft.dv.rewriteMinBytes" -> "0",
             "spark.graft.dv.rewriteFraction" -> "0.3") {
      // matches ~43% of the table, all of it inside d1+d2; rows where
      // the predicate is NULL (m = 3) must be KEPT, the SQL contract
      spark.sql("DELETE FROM dv_esc WHERE k < 1500 AND " +
        "if(m = 3, cast(null as boolean), true)")
      val v = st.versions("t").max
      assert(st.manifestDels("t", v).isEmpty,
        "a wide delete must not publish a deletion vector")
      val dirsAfter = st.manifestDirs("t", Some(v))
      // d3 holds no matches: carried BY NAME; d1/d2 rewritten away
      assert(dirsAfter.contains(dirsBefore(2)), s"$dirsBefore -> $dirsAfter")
      assert(!dirsAfter.contains(dirsBefore.head) &&
        !dirsAfter.contains(dirsBefore(1)), s"$dirsBefore -> $dirsAfter")
      // deleted = k < 1500 with m != 3; m = k % 7 == 3 for 214 such keys
      assert(st.read("t").count() == 3000L - (1500L - 214L))
      assert(st.read("t").agg(min(col("k"))).head().getLong(0) == 3L)
    }
  }

  test("escalated delete: fences carry, prior vectors stay honored, zero match returns base") {
    val (st, _) = freshStore()
    seed(st)
    // a prior NARROW delete leaves a vector...
    st.deleteWhere("t", "k", col("k") === 7L, txn = Some(41L))
    withConf("spark.graft.dv.rewriteMinBytes" -> "0",
             "spark.graft.dv.rewriteFraction" -> "0.3") {
      // ...the wide rewrite applies it on the touched dirs and carries
      // the txn history forward
      val base = st.versions("t").max
      assert(st.deleteWhere("t", "k", col("k") >= 4000L) == base,
        "zero matches must not publish")
      val v = st.deleteWhere("t", "k", col("k") >= 2000L, txn = Some(42L))
      assert(v == base + 1)
      assert(st.read("t").count() == 2000L - 1L) // k=7 stays deleted
      assert(st.read("t").where(col("k") === 7L).isEmpty)
      assert(st.appliedTxns("t") == Set(41L, 42L))
    }
  }

  test("a probed delete below both thresholds stays a deletion vector") {
    val (st, _) = freshStore()
    seed(st)
    val dirsBefore = st.manifestDirs("t").toSet
    withConf("spark.graft.dv.rewriteMinBytes" -> "0",
             "spark.graft.dv.rewriteFraction" -> "0.5",
             "spark.graft.dv.rewriteMinKeys" -> "100000") {
      val v = st.deleteWhere("t", "k", col("k") < 400)
      assert(st.manifestDels("t", v).nonEmpty, "narrow delete keeps the DV path")
      assert(st.manifestDirs("t", Some(v)).toSet == dirsBefore,
        "DV path must not rewrite data dirs")
      assert(st.read("t").count() == 3600L)
    }
  }

  test("dv.rewriteMinKeys escalates an absolute-size delete even below the fraction") {
    val (st, _) = freshStore()
    seed(st)
    withConf("spark.graft.dv.rewriteMinBytes" -> "0",
             "spark.graft.dv.rewriteFraction" -> "0.99",
             "spark.graft.dv.rewriteMinKeys" -> "200") {
      val v = st.deleteWhere("t", "k", col("k") < 400)
      assert(st.manifestDels("t", v).isEmpty,
        "400 matched keys >= rewriteMinKeys=200 must rewrite, not vector")
      assert(st.read("t").count() == 3600L)
    }
  }

  test("escalated delete aligns schema-evolved predicate columns") {
    val (st, _) = freshStore()
    st.commit("t", (0 until 2000).map(k => (k.toLong, s"v$k")).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k"))
    // evolve: `flag` exists only in the second dir's rows
    st.commit("t", (2000 until 3000).map(k => (k.toLong, s"v$k", k % 2))
      .toDF("k", "v", "flag"), overwrite = false, statsCols = Seq("k"))
    withConf("spark.graft.dv.rewriteMinBytes" -> "0",
             "spark.graft.dv.rewriteFraction" -> "0.3") {
      // matches every pre-evolution row; the touched dir lacks `flag`
      // on disk — the rewrite must align, not fail resolution
      val v = st.deleteWhere("t", "k", col("flag").isNull)
      assert(st.manifestDels("t", v).isEmpty, "2/3 matched must rewrite")
      assert(st.read("t").count() == 1000L)
      assert(st.read("t").schema.fieldNames.contains("flag"))
    }
    // the probed DV path's matched-dirs key scan aligns too
    withConf("spark.graft.dv.rewriteMinBytes" -> "0",
             "spark.graft.dv.rewriteFraction" -> "0.99",
             "spark.graft.dv.rewriteMinKeys" -> "100000") {
      val v2 = st.deleteWhere("t", "k", col("flag") === 1)
      assert(st.manifestDels("t", v2).nonEmpty, "narrow delete stays DV")
      assert(st.read("t").count() == 500L)
    }
  }

  test("size-tiered fold: the dominant vector is carried verbatim, not rewritten") {
    val (st, _) = freshStore()
    seed(st)
    withConf("spark.graft.dv.maxVectors" -> "2") {
      // one BIG delete (d1 dominates), then small ones trigger folds
      st.deleteWhere("t", "k", col("k") < 1000) // d1: 1000 keys
      st.deleteWhere("t", "k", col("k") === 1000L)
      val delsBefore = st.manifestDels("t", st.versions("t").max)
      val big = delsBefore.head // d1 (publish order)
      st.deleteWhere("t", "k", col("k") === 1001L) // 3 > maxV -> fold
      val delsAfter = st.manifestDels("t", st.versions("t").max)
      assert(delsAfter.size <= 2, delsAfter.toString)
      assert(delsAfter.contains(big),
        s"dominant vector $big must carry verbatim through the fold: $delsAfter")
      assert(st.read("t").count() == 4000L - 1002L)
      // fold-of-fold over more rounds stays correct and bounded
      for (i <- 1002 until 1012)
        st.deleteWhere("t", "k", col("k") === i.toLong)
      val v = st.versions("t").max
      assert(st.manifestDels("t", v).size <= 2)
      assert(st.read("t").count() == 4000L - 1012L)
      assert(st.read("t").agg(min(col("k"))).head().getLong(0) == 1012L)
    }
  }

  test("a fold past the broadcast bound writes partitioned, not one task") {
    val (st, root) = freshStore()
    seed(st, 0 until 8000)
    // AQE's partition coalescing would (correctly) collapse this
    // spec-sized fold back to one partition; disable it so the test
    // observes the fold's OWN parallel-write decision
    withConf("spark.graft.dv.maxVectors" -> "1",
             "spark.graft.dv.broadcastMaxBytes" -> "1",
             "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      st.deleteWhere("t", "k", col("k") % 3 === 0)
      st.deleteWhere("t", "k", col("k") % 3 === 1) // 2 > maxV -> fold
      val dels = st.manifestDels("t", st.versions("t").max)
      assert(dels.size == 1, dels.toString)
      val parquetFiles = new java.io.File(s"$root/t/data/${dels.head}")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(parquetFiles > 1,
        s"an over-bound fold must keep write parallelism, got $parquetFiles file(s)")
      assert(st.read("t").count() == 2666L)
    }
  }

  test("retryOnConflict: racing keyed merges all land; exhaustion rethrows") {
    val (st, _) = freshStore()
    st.commit("t", Seq((0L, "seed")).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (1 to 3).flatMap { w =>
      (1 to 3).map { i =>
        scala.concurrent.Future {
          // each attempt re-runs the WHOLE mergeInto (fresh base read)
          st.retryOnConflict(attempts = 50) {
            st.mergeInto("t", Seq((w * 10L + i, s"w$w-$i")).toDF("k", "v"),
              "k", statsCols = Seq("k"))
          }
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(st.versions("t") == (1L to 10L), st.versions("t").toString)
    assert(st.read("t").count() == 10L) // seed + 9 merged keys, once each
    // exhaustion: a body that always conflicts rethrows after the cap
    var calls = 0
    val ex = intercept[RuntimeException](
      st.retryOnConflict(attempts = 3, baseBackoffMs = 1) {
        calls += 1
        throw new st.SnapshotConflict("always stale")
      })
    assert(ex.getMessage.contains("always stale"))
    assert(calls == 3, s"expected exactly 3 attempts, got $calls")
  }

  test("legacyTxnFence: the one-restart migration switch honors raw batch-id fences") {
    val (st, _) = freshStore()
    st.commit("t", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    // a pre-upgrade sink fenced batch 5 with the RAW batch id
    st.appendOnce("t", Seq((2L, "b")).toDF("k", "v"), txnId = 5L)
    val replay = Seq((2L, "b")).toDF("k", "v")
    import org.apache.spark.sql.streaming.OutputMode
    new GraftTableSink(st, "t", OutputMode.Append(), None, Nil,
      txnNamespace = Some("ckpt"), legacyTxnFence = true)
      .addBatch(5L, replay)
    assert(st.read("t").count() == 2L, "legacy fence must skip the replayed batch")
    // without the switch the salted id does not match -> re-applies
    new GraftTableSink(st, "t", OutputMode.Append(), None, Nil,
      txnNamespace = Some("ckpt"))
      .addBatch(5L, replay)
    assert(st.read("t").count() == 3L)
  }
}
