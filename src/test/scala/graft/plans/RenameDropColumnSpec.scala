package graft.plans

import graft.SparkSpec

/** Round-16: `ALTER TABLE … RENAME TO` (a pure catalog-binding move —
  * data untouched) and `ALTER TABLE … DROP COLUMN` (metadata-only: a
  * manifest republish + read-time projection, physical removal at the
  * next full rewrite) — the two schema-migration statements real
  * migrations write that were missing from the add-only surface.
  */
class RenameDropColumnSpec extends SparkSpec {

  private var n = 0
  private def freshRoot(): String = {
    n += 1
    graft.sources.Scratch.processScoped("renamedrop_spec", "spec") + s"/case$n"
  }

  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set("spark.graft.store.root", root)
    try body finally spark.conf.unset("spark.graft.store.root")
  }

  test("RENAME TO moves the whole binding, zero data IO, durable") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE rn1 (k BIGINT, v STRING, w DOUBLE) " +
        "USING graft PRIMARY KEY k CLUSTER BY (k)")
      spark.sql("INSERT INTO rn1 VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
      spark.sql("ALTER TABLE rn1 ADD CONSTRAINT wpos CHECK (w >= 0)")
      val (st, view) = GraftTableRegistry.lookup("rn1").get
      val dirsBefore = st.manifestDirs(view)
      val vBefore = st.versions(view).max
      val r = spark.sql("ALTER TABLE rn1 RENAME TO rn1b").head()
      assert(r.getString(0) == "rn1b" && r.getString(1) == "rn1")
      // pure metadata: no new version, no dir moved, old name unbound
      assert(st.versions(view).max == vBefore && st.manifestDirs(view) == dirsBefore)
      assert(GraftTableRegistry.lookup("rn1").isEmpty)
      // key / clustering / constraints all moved with the binding
      assert(GraftTableRegistry.lookupKey("rn1b").contains("k"))
      assert(GraftTableRegistry.lookupCluster("rn1b") == Seq("k"))
      assert(GraftTableRegistry.lookupChecks("rn1b").map(_._1) == Seq("wpos"))
      spark.sql("UPDATE rn1b SET v = 'bb' WHERE k = 2")
      val viol = scala.util.Try(
        spark.sql("INSERT INTO rn1b VALUES (3, 'c', -1.0)").collect())
      assert(viol.isFailure, "the CHECK constraint still guards after rename")
      // the old name is gone from SQL resolution entirely
      val gone = scala.util.Try(spark.sql("DELETE FROM rn1 WHERE k = 1").collect())
      assert(gone.isFailure)
      // durable: a restarted JVM resolves the NEW name only
      GraftTableRegistry.clearInMemory()
      assert(spark.sql("SELECT count(*) FROM rn1b").head().getLong(0) == 2L)
      GraftTableRegistry.clearInMemory()
      assert(GraftTableRegistry.lookup("rn1").isEmpty,
        "the old binding must not re-materialize from the durable catalog")
      // SHOW CREATE replays as CREATE-under-view + RENAME
      val stmts = spark.sql("SHOW CREATE TABLE rn1b").collect()
        .map(_.getString(0)).toSeq
      assert(stmts.exists(_.startsWith("CREATE TABLE IF NOT EXISTS rn1 (")) &&
        stmts.contains("ALTER TABLE rn1 RENAME TO rn1b"),
        stmts.mkString("\n"))
      spark.sql("DROP TABLE rn1b")
      GraftTableRegistry.clearInMemory()
      stmts.foreach(spark.sql(_))
      assert(spark.sql("SELECT count(*) FROM rn1b").head().getLong(0) == 2L)
      assert(GraftTableRegistry.lookupChecks("rn1b").map(_._1) == Seq("wpos"))
      spark.sql("DROP TABLE rn1b")
    }
  }

  test("RENAME refusals: unregistered source falls through; taken target refuses") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE rn2 (k BIGINT) USING graft")
      spark.sql("CREATE TABLE rn3 (k BIGINT) USING graft")
      val taken = scala.util.Try(
        spark.sql("ALTER TABLE rn2 RENAME TO rn3").collect())
      assert(taken.isFailure &&
        taken.failed.get.getMessage.contains("already a registered"),
        taken.toString)
      // an unregistered source is NOT claimed — stock Spark's error
      val e = intercept[Exception](
        spark.sql("ALTER TABLE nope16 RENAME TO alsonope").collect())
      assert(!e.getMessage.contains("graft"), e.getMessage)
      spark.sql("DROP TABLE rn2"); spark.sql("DROP TABLE rn3")
    }
  }

  test("DROP COLUMN is metadata-only; time travel sees the pre-drop schema; " +
      "OPTIMIZE removes the bytes and re-enables the name") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE dc1 (k BIGINT, v STRING, junk DOUBLE) " +
        "USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO dc1 VALUES (1, 'a', 9.9), (2, 'b', 8.8)")
      val (st, view) = GraftTableRegistry.lookup("dc1").get
      val preDrop = st.versions(view).max
      val dirsBefore = st.manifestDirs(view)
      spark.sql("ALTER TABLE dc1 DROP COLUMN junk")
      // zero data IO: the same dirs republished, one version ahead
      assert(st.manifestDirs(view) == dirsBefore)
      assert(st.versions(view).max == preDrop + 1)
      assert(spark.sql("SELECT * FROM dc1").columns.toSeq == Seq("k", "v"))
      // the column is versioned state: pre-drop snapshots still carry it
      assert(spark.sql(s"SELECT * FROM dc1 VERSION AS OF $preDrop")
        .columns.toSeq == Seq("k", "v", "junk"))
      assert(spark.sql(s"SELECT junk FROM dc1 VERSION AS OF $preDrop " +
        "WHERE k = 1").head().getDouble(0) == 9.9)
      // appends after the drop are post-drop shaped; keyed DML works
      spark.sql("INSERT INTO dc1 VALUES (3, 'c')")
      spark.sql("UPDATE dc1 SET v = 'cc' WHERE k = 3")
      assert(spark.sql("SELECT count(*) FROM dc1").head().getLong(0) == 3L)
      // SHOW CREATE reflects the post-drop schema
      val ddl = spark.sql("SHOW CREATE TABLE dc1").head().getString(0)
      assert(!ddl.contains("junk"), ddl)
      // re-adding the name refuses while the bytes remain
      val readd = scala.util.Try(
        spark.sql("ALTER TABLE dc1 ADD COLUMNS (junk DOUBLE)").collect())
      assert(readd.isFailure &&
        readd.failed.get.getMessage.contains("dropped metadata-only"),
        readd.toString)
      // the full rewrite physically removes the column and clears the
      // list — the name is reusable, born NULL
      spark.sql("OPTIMIZE dc1")
      val head = st.versions(view).max
      assert(st.manifestDrops(view, head).isEmpty)
      spark.sql("ALTER TABLE dc1 ADD COLUMNS (junk DOUBLE)")
      assert(spark.sql("SELECT junk FROM dc1 WHERE k = 1").head().isNullAt(0),
        "a re-added name must NOT resurrect the old values")
      spark.sql("DROP TABLE dc1")
    }
  }

  test("DROP COLUMN refusals: key, cluster column, CHECK-referenced, unknown") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE dc2 (k BIGINT, a BIGINT, b BIGINT, v STRING) " +
        "USING graft PRIMARY KEY k CLUSTER BY (a, b)")
      spark.sql("INSERT INTO dc2 VALUES (1, 2, 3, 'x')")
      spark.sql("ALTER TABLE dc2 ADD CONSTRAINT vnn CHECK (v IS NOT NULL)")
      def refuse(c: String, hint: String): Unit = {
        val t = scala.util.Try(
          spark.sql(s"ALTER TABLE dc2 DROP COLUMN $c").collect())
        assert(t.isFailure && t.failed.get.getMessage.contains(hint),
          s"$c: $t")
      }
      refuse("k", "PRIMARY KEY")
      refuse("a", "CLUSTER BY")
      refuse("v", "CHECK constraint")
      refuse("zzz", "no column")
      // after clearing the guards the drops go through (multi-column)
      spark.sql("ALTER TABLE dc2 DROP CONSTRAINT vnn")
      spark.sql("ALTER TABLE dc2 CLUSTER BY NONE")
      spark.sql("ALTER TABLE dc2 DROP COLUMNS a, b")
      assert(spark.sql("SELECT * FROM dc2").columns.toSeq == Seq("k", "v"))
      spark.sql("DROP TABLE dc2")
    }
  }

  test("dropped columns ride clone / restore / streaming reads consistently") {
    val root = freshRoot()
    withRoot(root) {
      import spark.implicits._
      spark.sql("CREATE TABLE dc3 (k BIGINT, v STRING, junk BIGINT) " +
        "USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO dc3 VALUES (1, 'a', 7)")
      spark.sql("ALTER TABLE dc3 DROP COLUMN junk")
      val (st, view) = GraftTableRegistry.lookup("dc3").get
      // restore to the PRE-drop version resurfaces the column (the
      // drop list is versioned state the restore republishes)
      val preDrop = 2L
      spark.sql(s"RESTORE TABLE dc3 TO VERSION AS OF $preDrop")
      assert(spark.sql("SELECT * FROM dc3").columns.contains("junk"))
      spark.sql("ALTER TABLE dc3 DROP COLUMN junk")
      // a shallow clone carries the drop
      st.cloneView(view, "dc3_clone")
      assert(!st.read("dc3_clone").columns.contains("junk"))
      // the table-as-a-stream is post-drop shaped too
      val seen = st.readAppended(view, 0L, st.versions(view).max)
      assert(!seen.columns.contains("junk"))
      spark.sql("DROP TABLE dc3")
    }
  }
}
