package graft.plans

import graft.SparkSpec
import graft.sources.{Scratch, SnapshotStore}
import org.apache.spark.sql.streaming.Trigger

/** Round-17 statement-tier hardening: CHECK constraints FOLLOW a
  * column rename (mechanical round-trip-proven rewrite), COPY INTO
  * FORCE (fence-blind reload), the legacy-fence auto-consult +
  * one-shot migration, and the sink-side catalog fold from the sink's
  * own root option.
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshRoot(): String = {
    n += 1
    Scratch.processScoped("round17_spec", "spec") + s"/case$n"
  }
  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set("spark.graft.store.root", root)
    try body finally spark.conf.unset("spark.graft.store.root")
  }

  test("CHECK constraints follow RENAME COLUMN: rewritten, enforcing, SHOW CREATE emits the new spelling") {
    withRoot(freshRoot()) {
      spark.sql("CREATE TABLE ck1 (k BIGINT, amount DOUBLE) USING graft " +
        "PRIMARY KEY k")
      spark.sql("INSERT INTO ck1 VALUES (1, 5.0)")
      spark.sql("ALTER TABLE ck1 ADD CONSTRAINT pos CHECK (amount > 0)")
      spark.sql("ALTER TABLE ck1 RENAME COLUMN amount TO amt")
      // still enforcing under the NEW name
      val bad = scala.util.Try(
        spark.sql("INSERT INTO ck1 VALUES (2, -1.0)").collect())
      assert(bad.isFailure, "the migrated constraint must still enforce")
      spark.sql("INSERT INTO ck1 VALUES (3, 7.0)")
      assert(spark.sql("SELECT count(*) FROM ck1").head().getLong(0) == 2L)
      // the stored spelling migrated
      val checks = GraftTableRegistry.lookupChecks("ck1")
      assert(checks.size == 1 && checks.head._2.contains("amt") &&
        !checks.head._2.contains("amount"), checks.toString)
      val show = spark.sql("SHOW CREATE TABLE ck1").collect()
        .map(_.getString(0)).mkString("\n")
      assert(show.contains("amt"), show)
      spark.sql("DROP TABLE ck1")
    }
  }

  test("CHECK rename rewrite survives a qualified/complex expression") {
    withRoot(freshRoot()) {
      spark.sql("CREATE TABLE ck2 (k BIGINT, a DOUBLE, b DOUBLE) " +
        "USING graft PRIMARY KEY k")
      spark.sql("ALTER TABLE ck2 ADD CONSTRAINT rng " +
        "CHECK (a + b > 0 AND (a < 100 OR b < 100))")
      spark.sql("ALTER TABLE ck2 RENAME COLUMN a TO alpha")
      val ex = GraftTableRegistry.lookupChecks("ck2").head._2
      assert(ex.contains("alpha") && !ex.matches(".*\\ba\\b.*"), ex)
      val bad = scala.util.Try(
        spark.sql("INSERT INTO ck2 VALUES (1, -5.0, 2.0)").collect())
      assert(bad.isFailure)
      spark.sql("INSERT INTO ck2 VALUES (1, 5.0, 2.0)")
      spark.sql("DROP TABLE ck2")
    }
  }

  test("COPY INTO FORCE reloads an unchanged file exactly once more; plain re-run still skips") {
    val root = freshRoot()
    withRoot(root) {
      val land = root + "/land"
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "p").coalesce(1).write.parquet(land)
      spark.sql("CREATE TABLE cf1 (k BIGINT, p DOUBLE) USING graft")
      val r1 = spark.sql(
        s"COPY INTO cf1 FROM '$land' FILEFORMAT = PARQUET").head()
      assert(r1.getLong(2) == 1L && r1.getLong(4) == 0L, s"$r1")
      // plain re-run: fenced skip (the q298 contract unchanged)
      val r2 = spark.sql(
        s"COPY INTO cf1 FROM '$land' FILEFORMAT = PARQUET").head()
      assert(r2.getLong(2) == 0L && r2.getLong(4) == 1L, s"$r2")
      // FORCE: reloads regardless of the fence
      val r3 = spark.sql(
        s"COPY INTO cf1 FROM '$land' FILEFORMAT = PARQUET FORCE").head()
      assert(r3.getLong(2) == 1L && r3.getLong(4) == 0L, s"$r3")
      assert(spark.sql("SELECT count(*) FROM cf1").head().getLong(0) == 4L)
      // and the fence still stands for the next plain run
      val r4 = spark.sql(
        s"COPY INTO cf1 FROM '$land' FILEFORMAT = PARQUET").head()
      assert(r4.getLong(2) == 0L && r4.getLong(4) == 1L, s"$r4")
      spark.sql("DROP TABLE cf1")
    }
  }

  test("pre-upgrade table (no files field): legacy fences auto-consult and MIGRATE in one run") {
    val root = freshRoot()
    withRoot(root) {
      val land = root + "/land"
      Seq((1L, 1.0)).toDF("k", "p").coalesce(1).write.parquet(land)
      val f = {
        val l = java.nio.file.Files.list(java.nio.file.Paths.get(land))
        try {
          import scala.jdk.CollectionConverters._
          l.iterator().asScala.map(_.toString)
            .filter(_.endsWith(".parquet")).toSeq.head
        } finally l.close()
      }
      // hand-craft a genuinely PRE-UPGRADE table: data dir + a manifest
      // with NO `files` field, the legacy path-only fence in the txns
      val st = new SnapshotStore(spark, root)
      val dataDir = java.nio.file.Paths.get(root, "lf2", "data", "b1-legacy")
      java.nio.file.Files.createDirectories(dataDir.getParent)
      spark.read.parquet(land).write.parquet(dataDir.toString)
      val mdir = java.nio.file.Paths.get(root, "lf2", "_manifests")
      java.nio.file.Files.createDirectories(mdir)
      java.nio.file.Files.writeString(mdir.resolve("v000001.json"),
        s"""{"dirs":["b1-legacy"],"dels":[],"ts":1,""" +
          s""""txns":[${st.fileFenceLegacy(f)}]}""")
      assert(!st.hasFileFenceField("lf2"), "setup: head must lack the field")
      GraftTableRegistry.register("lf2", st, "lf2")
      // an UNRELATED post-upgrade commit (a stream's append) must NOT
      // destroy the pre-upgrade signal: publish preserves the files
      // field's absence when the predecessor lacked it and no fences
      // fold in this commit
      st.commit("lf2", Seq((2L, 2.0)).toDF("k", "p"), overwrite = false)
      assert(!st.hasFileFenceField("lf2"),
        "an interim non-COPY commit must preserve the legacy signal")
      // WITHOUT any switch: the auto-consult recognizes the legacy
      // fence (no silent re-load) and MIGRATES it via a fence-only
      // publish
      val r1 = spark.sql(
        s"COPY INTO lf2 FROM '$land' FILEFORMAT = PARQUET").head()
      assert(r1.getLong(2) == 0L && r1.getLong(4) == 1L,
        s"auto-consult must fence the pre-upgrade load: $r1")
      assert(st.hasFileFenceField("lf2"),
        "the run must migrate the fence into the files field")
      assert(st.appliedFileFences("lf2").contains(st.fileFence(f)))
      // second run: skipped through the MODERN field (auto-consult off)
      val r2 = spark.sql(
        s"COPY INTO lf2 FROM '$land' FILEFORMAT = PARQUET").head()
      assert(r2.getLong(2) == 0L && r2.getLong(4) == 1L, s"$r2")
      assert(spark.sql("SELECT count(*) FROM lf2 WHERE k = 1")
        .head().getLong(0) == 1L, "the file must never have re-loaded")
      GraftTableRegistry.unregister("lf2")
    }
  }

  test("sink-side catalog fold: an option-only stream in a conf-less session keeps the declared layout") {
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    import spark.implicits._
    // declare the layout with the session conf present...
    withRoot(root) {
      spark.sql("CREATE TABLE sf1 (k BIGINT, a BIGINT, b BIGINT) " +
        "USING graft PRIMARY KEY k CLUSTER BY (a, b)")
      st.commit("src", (0L until 256L).map(i => (i, i % 16, i / 16))
        .toDF("k", "a", "b"), overwrite = true)
    }
    // ...then simulate a FRESH JVM with NO session conf: in-memory
    // registry wiped, stream configured purely by options
    GraftTableRegistry.clearInMemory()
    assert(spark.conf.getOption("spark.graft.store.root").isEmpty)
    val q = spark.readStream.format("graft-table")
      .option("root", root).option("view", "src")
      .load().writeStream.format("graft-table")
      .option("root", root).option("view", "sf1")
      .option("checkpointLocation", s"$root/_cp")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val dirs = st.manifestDirs("sf1")
    assert(dirs.size > 1,
      s"the fold from the sink's root option must keep the declared " +
        s"range layout: $dirs")
    val (_, skip) = st.pruneDirsBox("sf1",
      Seq(("a", "2", "3"), ("b", "2", "3")))
    assert(skip.nonEmpty, "the landed layout must box-prune")
    assert(st.read("sf1").count() == 256L)
    withRoot(root)(spark.sql("DROP TABLE sf1"))
  }
}
