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
}
