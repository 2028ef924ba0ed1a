package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** The graft-table streaming source: offsets are committed snapshot
  * versions, batches are the manifest-diff rows, and everything a
  * restart replays comes from immutable manifests — exactly-once with
  * zero source-side state.
  */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (SnapshotStore, String) = {
    n += 1
    val root = Scratch.processScoped("tablestream_spec", "spec") + s"/case$n"
    (new SnapshotStore(spark, root), root)
  }

  private def drainTo(root: String, results: scala.collection.mutable.Buffer[(Long, Set[Long])],
                      extra: Map[String, String] = Map.empty,
                      cp: String = "_cp"): Unit = {
    var r = spark.readStream.format("graft-table")
      .option("root", root).option("view", "src")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load().writeStream
      .option("checkpointLocation", s"$root/$cp")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val ks = batch.select(col("k")).collect().map(_.getLong(0)).toSet
        if (ks.nonEmpty) results.synchronized { results += ((id, ks)) }
        ()
      }.start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
  }

  test("append mode: initial snapshot, then exactly the appended commits, then nothing") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), overwrite = true)
    val got = scala.collection.mutable.Buffer.empty[(Long, Set[Long])]
    drainTo(root, got)
    assert(got.map(_._2).toSet == Set(Set(1L, 2L)), got.toString)
    st.commit("src", Seq((3L, "c")).toDF("k", "v"), overwrite = false)
    st.commit("src", Seq((4L, "d")).toDF("k", "v"), overwrite = false)
    drainTo(root, got)
    assert(got.flatMap(_._2).toSet == Set(1L, 2L, 3L, 4L))
    assert(got.flatMap(_._2).size == 4, s"re-emission: $got")
    val before = got.size
    drainTo(root, got) // no new commits: the offset log already covers it
    assert(got.size == before, "a drained stream must emit nothing")
  }

  test("a delete in the offset range never surfaces the deleted rows") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    val got = scala.collection.mutable.Buffer.empty[(Long, Set[Long])]
    drainTo(root, got)
    st.commit("src", Seq((2L, "b"), (3L, "c")).toDF("k", "v"), overwrite = false)
    st.deleteWhere("src", "k", col("k") === 3L)
    drainTo(root, got)
    // the appended batch (2,3] applies v3's deletion vector: 3 is gone
    assert(got.flatMap(_._2).toSet == Set(1L, 2L))
  }

  test("a deletion-vector FOLD inside the offset range is invisible to the append stream") {
    // three deletes with the fold threshold dialed to 2: the third
    // publish merges the carried vectors into one new key-list dir —
    // a dels-only manifest change that must NOT trip the rewrite
    // detector (data dirs are untouched), and the appended batch must
    // apply the FOLDED list
    spark.conf.set("spark.graft.dv.maxVectors", "2")
    try {
      val (st, root) = fresh()
      st.commit("src", (0L until 10L).map(k => (k, "a")).toDF("k", "v"),
        overwrite = true)
      val got = scala.collection.mutable.Buffer.empty[(Long, Set[Long])]
      drainTo(root, got)
      st.commit("src", (10L until 20L).map(k => (k, "b")).toDF("k", "v"),
        overwrite = false)
      Seq(10L, 11L, 12L).foreach(k =>
        st.deleteWhere("src", "k", col("k") === k))
      assert(st.manifestDels("src", st.versions("src").max).size <= 2,
        "the fold must have fired")
      drainTo(root, got)
      assert(got.flatMap(_._2).toSet ==
        (0L until 10L).toSet ++ (13L until 20L).toSet, got.toString)
    } finally spark.conf.unset("spark.graft.dv.maxVectors")
  }

  test("a rewriting commit mid-range fails loudly; ignoreRewrites opts in") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    val got = scala.collection.mutable.Buffer.empty[(Long, Set[Long])]
    drainTo(root, got)
    st.compact("src") // rewrites every dir
    val ex = intercept[StreamingQueryException] { drainTo(root, got) }
    assert(ex.getMessage != null)
    // opt-in re-emission: the compacted dir re-surfaces its rows
    drainTo(root, got, Map("ignoreRewrites" -> "true"))
    assert(got.flatMap(_._2).toSet == Set(1L))
  }

  test("change feed mode: initial inserts, then typed change rows") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"),
      overwrite = true, statsCols = Seq("k"))
    val rows = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.Row]
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("root", root).option("view", "src")
        .option("changeFeed", "true").option("keyColumns", "k")
        .load().writeStream
        .option("checkpointLocation", s"$root/_cpc")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val got = batch.collect()
          rows.synchronized { rows ++= got }
          ()
        }.start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    drainCdf()
    assert(rows.map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type")))
      .toSet == Set((1L, "insert"), (2L, "insert")))
    rows.clear()
    st.mergeInto("src", Seq((2L, 25.0), (9L, 90.0)).toDF("k", "x"), "k",
      statsCols = Seq("k"))
    drainCdf()
    val typed = rows.map(r => (r.getAs[Long]("k"),
      r.getAs[String]("change_type"))).toSet
    assert(typed == Set((2L, "update"), (9L, "insert")), typed.toString)
  }

  test("rate limit: maxVersionsPerTrigger walks one commit per batch") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    st.commit("src", Seq((2L, "b")).toDF("k", "v"), overwrite = false)
    st.commit("src", Seq((3L, "c")).toDF("k", "v"), overwrite = false)
    val got = scala.collection.mutable.Buffer.empty[(Long, Set[Long])]
    val q = spark.readStream.format("graft-table")
      .option("root", root).option("view", "src")
      .option("maxVersionsPerTrigger", "1")
      .load().writeStream
      .option("checkpointLocation", s"$root/_cp")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val ks = batch.select(col("k")).collect().map(_.getLong(0)).toSet
        if (ks.nonEmpty) got.synchronized { got += ((id, ks)) }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // one version per micro-batch: three distinct single-key batches
    assert(got.map(_._2).toList == List(Set(1L), Set(2L), Set(3L)), got.toString)
  }

  test("AvailableNow + rate limit drains EVERYTHING in capped batches") {
    // the admission-control contract: the run must not stop at the
    // first capped batch — it steps one version per batch to the
    // offset pinned at query start
    val (st, root) = fresh()
    st.commit("src", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    st.commit("src", Seq((2L, "b")).toDF("k", "v"), overwrite = false)
    st.commit("src", Seq((3L, "c")).toDF("k", "v"), overwrite = false)
    val got = scala.collection.mutable.Buffer.empty[(Long, Set[Long])]
    drainTo(root, got, Map("maxVersionsPerTrigger" -> "1"))
    assert(got.map(_._2).toList == List(Set(1L), Set(2L), Set(3L)), got.toString)
  }

  test("maxBytesPerTrigger: a soft byte cap over each batch's added dirs") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    st.commit("src", Seq((2L, "b")).toDF("k", "v"), overwrite = false)
    st.commit("src", Seq((3L, "c")).toDF("k", "v"), overwrite = false)
    // every commit's dir is larger than 1 byte -> one version per batch
    // (soft cap: an over-cap commit still makes progress)
    val tiny = scala.collection.mutable.Buffer.empty[(Long, Set[Long])]
    drainTo(root, tiny, Map("maxBytesPerTrigger" -> "1"), cp = "_cpB1")
    assert(tiny.map(_._2).toList == List(Set(1L), Set(2L), Set(3L)),
      tiny.toString)
    // a cap above the total admits everything in one batch
    val big = scala.collection.mutable.Buffer.empty[(Long, Set[Long])]
    drainTo(root, big, Map("maxBytesPerTrigger" -> (1L << 30).toString),
      cp = "_cpB2")
    assert(big.map(_._2).toList == List(Set(1L, 2L, 3L)), big.toString)
  }

  test("sink: merge mode upserts by key, txn-fenced per batch") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"), overwrite = true)
    def drain(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("root", root).option("view", "src")
        .option("changeFeed", "true").option("keyColumns", "k").load()
        .select(col("k"), col("x_post").as("x"))
        .where(col("change_type") =!= "delete")
        .writeStream.format("graft-table")
        .option("root", root).option("view", "out")
        .option("mergeKey", "k").option("statsColumns", "k")
        .option("checkpointLocation", s"$root/_cp")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    drain()
    st.mergeInto("src", Seq((2L, 25.0), (3L, 30.0)).toDF("k", "x"), "k",
      statsCols = Seq("k"))
    drain()
    val out = st.read("out").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((1L, 10.0), (2L, 25.0), (3L, 30.0)), out.toString)
    val v = st.versions("out").max
    drain() // nothing new: fence holds
    assert(st.versions("out").max == v)
  }

  test("sink: deleteColumn applies CDC tombstones; requires mergeKey") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, 10.0), (2L, 20.0), (9L, 90.0)).toDF("k", "x"),
      overwrite = true, statsCols = Seq("k"))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("root", root).option("view", "src")
        .option("changeFeed", "true").option("keyColumns", "k").load()
        .select(col("k"), col("x_post").as("x"),
          (col("change_type") === "delete").as("del"))
        .writeStream.format("graft-table")
        .option("root", root).option("view", "out")
        .option("mergeKey", "k").option("deleteColumn", "del")
        .option("statsColumns", "k")
        .option("checkpointLocation", s"$root/_cp")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    drain() // snapshot inserts (del all false)
    st.deleteWhere("src", "k", col("k") === 9L) // DV delete on the source
    st.mergeInto("src", Seq((2L, 25.0)).toDF("k", "x"), "k",
      statsCols = Seq("k"))
    drain() // one diff range: the tombstone deletes, the update upserts
    val out = st.read("out").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((1L, 10.0), (2L, 25.0)), out.toString)
    // tombstones are keyed: deleteColumn without mergeKey refuses
    val ex = intercept[IllegalArgumentException](
      new GraftTableSourceProvider().createSink(spark.sqlContext,
        Map("root" -> root, "view" -> "out", "deleteColumn" -> "del"),
        Nil, org.apache.spark.sql.streaming.OutputMode.Append()))
    assert(ex.getMessage.contains("mergeKey"), ex.getMessage)
    // ...and Complete mode (verbatim overwrite) refuses the option
    // instead of silently committing flag columns and dead rows
    val ex2 = intercept[IllegalArgumentException](
      new GraftTableSourceProvider().createSink(spark.sqlContext,
        Map("root" -> root, "view" -> "out", "mergeKey" -> "k",
          "deleteColumn" -> "del"),
        Nil, org.apache.spark.sql.streaming.OutputMode.Complete()))
    assert(ex2.getMessage.contains("Complete"), ex2.getMessage)
  }

  test("change feed: a vacuumed checkpoint offset fails loudly, never re-emits the snapshot") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, 10.0)).toDF("k", "x"),
      overwrite = true, statsCols = Seq("k"))
    val rows = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.Row]
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("root", root).option("view", "src")
        .option("changeFeed", "true").option("keyColumns", "k")
        .load().writeStream
        .option("checkpointLocation", s"$root/_cpc")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val got = batch.collect()
          rows.synchronized { rows ++= got }
          ()
        }.start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    drainCdf() // offset log now ends at v1
    assert(rows.size == 1)
    st.commit("src", Seq((2L, 20.0)).toDF("k", "x"), overwrite = false,
      statsCols = Seq("k"))
    st.commit("src", Seq((3L, 30.0)).toDF("k", "x"), overwrite = false,
      statsCols = Seq("k"))
    st.vacuum("src", retainVersions = 1) // v1 (the offset) is gone
    val before = rows.size
    val ex = intercept[StreamingQueryException] { drainCdf() }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage)).mkString(" | ")
    assert(msgs.contains("no longer retained"), msgs)
    assert(rows.size == before,
      "the failed restart must not re-emit the snapshot as inserts")
  }

  test("sink: two independent queries on one view fence in disjoint txn spaces") {
    val (st, root) = fresh()
    st.commit("srcA", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    st.commit("srcB", Seq((2L, "b")).toDF("k", "v"), overwrite = true)
    // both queries write batch id 0 into the SAME output view; the
    // checkpoint-salted fence must keep them apart (a raw-batch-id
    // fence would silently swallow the second writer's batch 0)
    def drain(view: String, cp: String): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("root", root).option("view", view).load()
        .writeStream.format("graft-table")
        .option("root", root).option("view", "out")
        .option("checkpointLocation", s"$root/$cp")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    drain("srcA", "_cpA")
    drain("srcB", "_cpB")
    assert(st.read("out").select("k").as[Long].collect().toSet == Set(1L, 2L))
    // each query's OWN fence still holds across a restart
    val v = st.versions("out").max
    drain("srcA", "_cpA")
    drain("srcB", "_cpB")
    assert(st.versions("out").max == v, "redelivered batches must fence")
  }

  test("schema evolution: batches pin the stream-start schema; a fresh checkpoint adopts the new one") {
    val (st, root) = fresh()
    st.commit("src", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    val rows = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.Row]
    val schemas = scala.collection.mutable.Buffer.empty[Seq[String]]
    def drain(cp: String): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("root", root).option("view", "src").load()
        .writeStream
        .option("checkpointLocation", s"$root/$cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val got = batch.collect()
          rows.synchronized {
            rows ++= got
            if (got.nonEmpty) schemas += batch.columns.toSeq
          }
          ()
        }.start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // one RUNNING query: the pin applies within the run, so evolve the
    // table while it is live
    val q = spark.readStream.format("graft-table")
      .option("root", root).option("view", "src").load()
      .writeStream
      .option("checkpointLocation", s"$root/_cp1")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val got = batch.collect()
        rows.synchronized {
          rows ++= got
          if (got.nonEmpty) schemas += batch.columns.toSeq
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(schemas.last == Seq("k", "v")) // pinned at stream start
      // the table evolves mid-stream: a commit ADDS w and DROPS v
      st.commit("src", Seq((2L, 7L)).toDF("k", "w"), overwrite = false)
      rows.clear(); schemas.clear()
      q.processAllAvailable()
      // the running lineage stays on the pinned schema: w is dropped,
      // the dropped v reads NULL — same columns, order, types
      assert(schemas.last == Seq("k", "v"), schemas.toString)
      assert(rows.map(r => (r.getLong(0),
        Option(r.getString(1)))).toSeq == Seq((2L, None)))
    } finally q.stop()
    // restart on the SAME checkpoint re-pins at the current (merged)
    // schema — Delta's restart-to-pick-up-schema contract: the new
    // column surfaces, nothing already consumed re-emits
    st.commit("src", Seq((3L, 9L)).toDF("k", "w"), overwrite = false)
    rows.clear(); schemas.clear()
    drain("_cp1")
    assert(schemas.last.toSet == Set("k", "v", "w"), schemas.toString)
    assert(rows.size == 1, s"only the new commit replays: $rows")
    val r3 = rows.head
    assert(r3.getAs[Long]("k") == 3L)
    assert(Option(r3.getAs[String]("v")).isEmpty)
    assert(r3.getAs[Long]("w") == 9L)
  }

  test("readAppended is the deterministic range read under it all") {
    val (st, _) = fresh()
    st.commit("t", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2L, "b")).toDF("k", "v"), overwrite = false)
    st.commit("t", Seq((3L, "c")).toDF("k", "v"), overwrite = false)
    def ks(df: DataFrame) = df.select("k").as[Long].collect().toSet
    assert(ks(st.readAppended("t", 0L, 3L)) == Set(1L, 2L, 3L))
    assert(ks(st.readAppended("t", 1L, 3L)) == Set(2L, 3L))
    assert(ks(st.readAppended("t", 2L, 3L)) == Set(3L))
    assert(ks(st.readAppended("t", 3L, 3L)) == Set.empty[Long])
    // replay of the same range is identical (manifests are immutable)
    assert(ks(st.readAppended("t", 1L, 3L)) == Set(2L, 3L))
    st.compact("t")
    intercept[RuntimeException](st.readAppended("t", 3L, 4L))
    assert(ks(st.readAppended("t", 3L, 4L, allowRewrites = true)) ==
      Set(1L, 2L, 3L))
  }
}
