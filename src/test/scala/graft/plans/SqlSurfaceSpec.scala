package graft.plans

import graft.SparkSpec

/** Round-15 second wave of the SQL tier: SHOW CREATE TABLE (the
  * re-executable DDL), INSERT OVERWRITE, REPLACE WHERE, and CHECK
  * constraints ride here as they land.
  */
class SqlSurfaceSpec extends SparkSpec {

  private var n = 0
  private def freshRoot(): String = {
    n += 1
    graft.sources.Scratch.processScoped("sqlsurf_spec", "spec") + s"/case$n"
  }

  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set("spark.graft.store.root", root)
    try body finally spark.conf.unset("spark.graft.store.root")
  }

  test("SHOW CREATE TABLE round-trips: drop, wipe, replay the emitted DDL, DML") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE sct1 (k BIGINT, a BIGINT, b BIGINT, v STRING) " +
        "USING graft PRIMARY KEY k CLUSTER BY (a, b)")
      spark.sql("INSERT INTO sct1 VALUES (1, 2, 3, 'x'), (2, 5, 6, 'y')")
      val stmts = spark.sql("SHOW CREATE TABLE sct1").collect()
        .map(_.getString(0)).toSeq
      assert(stmts.nonEmpty && stmts.head.startsWith(
        "CREATE TABLE IF NOT EXISTS sct1 ("), stmts.mkString("\n"))
      assert(stmts.head.contains("USING graft"), stmts.head)
      assert(stmts.head.contains("PRIMARY KEY k"), stmts.head)
      assert(stmts.head.contains("CLUSTER BY (a, b)"), stmts.head)
      assert(stmts.head.contains("LOCATION '"), stmts.head)
      spark.sql("DROP TABLE sct1")
      GraftTableRegistry.clearInMemory()
      // the emitted rows, run in order, rebuild the binding (adoption:
      // the data survived the DROP — external-table semantics)
      stmts.foreach(spark.sql(_))
      assert(spark.sql("SELECT k, v FROM sct1").count() == 2L)
      // the key carried: keyed DML works
      spark.sql("UPDATE sct1 SET v = 'z' WHERE k = 2")
      assert(spark.sql("SELECT v FROM sct1 WHERE k = 2").head().getString(0)
        == "z")
      // the declared clustering carried too
      assert(GraftTableRegistry.lookupCluster("sct1") == Seq("a", "b"))
      spark.sql("DROP TABLE sct1")
    }
  }

  test("SHOW CREATE TABLE: keyless/clusterless table omits the clauses") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE sct2 (k BIGINT) USING graft")
      val s2 = spark.sql("SHOW CREATE TABLE sct2").head().getString(0)
      assert(!s2.contains("PRIMARY KEY") && !s2.contains("CLUSTER BY"), s2)
      spark.sql("DROP TABLE sct2")
    }
  }

  test("SHOW CREATE TABLE refuses a never-committed view; a divergent " +
      "view name replays as CREATE-under-view + RENAME") {
    val root = freshRoot()
    val st = new graft.sources.SnapshotStore(spark, root)
    GraftTableRegistry.register("sct3", st, "sct3")
    val bare = scala.util.Try(spark.sql("SHOW CREATE TABLE sct3").collect())
    assert(bare.isFailure &&
      bare.failed.get.getMessage.contains("no committed snapshot"),
      bare.toString)
    // a binding whose store view differs from the table name (rename,
    // or the Scala registration API) emits the adoption CREATE under
    // the VIEW's name followed by the RENAME that moves the binding
    import spark.implicits._
    st.commit("other_view", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    GraftTableRegistry.register("sct4", st, "other_view")
    val rows = spark.sql("SHOW CREATE TABLE sct4").collect().map(_.getString(0))
    assert(rows.length == 2 &&
      rows(0).startsWith("CREATE TABLE IF NOT EXISTS other_view") &&
      rows(1) == "ALTER TABLE other_view RENAME TO sct4",
      rows.mkString(" | "))
    GraftTableRegistry.unregister("sct3")
    GraftTableRegistry.unregister("sct4")
  }

  test("INSERT OVERWRITE swaps contents in one commit; history stays travelable") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE io1 (k BIGINT, v STRING) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO io1 VALUES (1, 'a'), (2, 'b')")
      val r = spark.sql(
        "INSERT OVERWRITE io1 VALUES (10, 'x'), (11, 'y'), (12, 'z')").head()
      assert(r.getLong(2) == 3L, s"rows_inserted: $r")
      assert(spark.sql("SELECT * FROM io1").count() == 3L)
      assert(spark.sql("SELECT * FROM io1 VERSION AS OF 2").count() == 2L,
        "the overwritten snapshot stays time-travelable")
      // the TABLE spelling works too, and PK enforcement applies to the
      // payload itself
      spark.conf.set("spark.graft.sql.enforcePrimaryKey", "true")
      try {
        val dup = scala.util.Try(spark.sql(
          "INSERT OVERWRITE TABLE io1 VALUES (5, 'p'), (5, 'q')"))
        assert(dup.isFailure &&
          dup.failed.get.getMessage.contains("repeats PRIMARY KEY"), dup.toString)
        // replacing rows that exist is NOT a conflict — they die with
        // the overwrite
        spark.sql("INSERT OVERWRITE TABLE io1 VALUES (10, 'new')")
        assert(spark.sql("SELECT v FROM io1").head().getString(0) == "new")
      } finally spark.conf.unset("spark.graft.sql.enforcePrimaryKey")
      spark.sql("DROP TABLE io1")
    }
  }

  test("REPLACE WHERE: atomic region swap, untouched dirs carried, stray rows refused") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE rw1 (k BIGINT, v DOUBLE) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO rw1 VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
      spark.sql("INSERT INTO rw1 VALUES (11, 11.0), (12, 12.0)")
      val (st, view) = GraftTableRegistry.lookup("rw1").get
      val before = st.manifestDirs(view)
      // before(0) is CREATE's empty seed dir (statless — always
      // conservatively touched); before(1) holds k in [1,3], whose
      // stats PROVE the predicate misses
      val lowDir = before(1)
      val r = spark.sql("INSERT INTO rw1 REPLACE WHERE k >= 10 AND k <= 20 " +
        "VALUES (15, 15.0)").head()
      assert(r.getLong(2) == 1L, s"rows_inserted: $r")
      val after = st.manifestDirs(view)
      assert(after.contains(lowDir),
        s"the provably-unmatched dir must carry by name: $before -> $after")
      val got = spark.sql("SELECT k FROM rw1 ORDER BY k").collect().map(_.getLong(0))
      assert(got.toSeq == Seq(1L, 2L, 3L, 15L), got.mkString(","))
      // a payload row OUTSIDE the region refuses in the write job,
      // before any publish
      val vBefore = st.versions(view).max
      val stray = scala.util.Try(spark.sql(
        "INSERT INTO rw1 REPLACE WHERE k >= 10 AND k <= 20 VALUES (5, 5.0)")
        .collect())
      assert(stray.isFailure, "a stray row must refuse")
      assert(st.versions(view).max == vBefore, "no publish on refusal")
      assert(spark.sql("SELECT count(*) FROM rw1").head().getLong(0) == 4L)
      // PK enforcement: conflicts with SURVIVING rows refuse; the
      // replaced region itself never conflicts
      spark.conf.set("spark.graft.sql.enforcePrimaryKey", "true")
      try {
        spark.sql("INSERT INTO rw1 REPLACE WHERE k >= 10 AND k <= 20 " +
          "VALUES (15, 99.0)") // 15 is being replaced — fine
        assert(spark.sql("SELECT v FROM rw1 WHERE k = 15").head().getDouble(0)
          == 99.0)
      } finally spark.conf.unset("spark.graft.sql.enforcePrimaryKey")
      spark.sql("DROP TABLE rw1")
    }
  }

  test("REPLACE WHERE resurrects payload keys a stale deletion vector suppressed") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE rw2 (k BIGINT, v DOUBLE) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO rw2 VALUES (1, 1.0), (2, 2.0)")
      spark.sql("INSERT INTO rw2 VALUES (100, 100.0), (101, 101.0)")
      spark.sql("DELETE FROM rw2 WHERE k = 100") // deletion vector {100}
      val (st, view) = GraftTableRegistry.lookup("rw2").get
      assert(st.manifestDels(view, st.versions(view).max).nonEmpty)
      // the replace re-inserts key 100: the carried vector must
      // SUBTRACT it — a stale vector silently suppressing a replaced-in
      // row would corrupt the region swap
      spark.sql("INSERT INTO rw2 REPLACE WHERE k >= 50 VALUES (100, 999.0)")
      assert(spark.sql("SELECT v FROM rw2 WHERE k = 100").head().getDouble(0)
        == 999.0, "the payload key must resurrect")
      assert(spark.sql("SELECT count(*) FROM rw2").head().getLong(0) == 3L)
      // the fully-subtracted vector dropped from the manifest
      assert(st.manifestDels(view, st.versions(view).max).isEmpty)
      spark.sql("DROP TABLE rw2")
    }
  }

  test("REPLACE WHERE never resurrects a deleted row living OUTSIDE the region") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    val st = new graft.sources.SnapshotStore(spark, root)
    // dirA holds region 1 (incl. k=5), dirB region 2 — region stats
    // make dirA provably outside a region-2 predicate
    st.commit("t", Seq((5L, 1L, 50.0), (6L, 1L, 60.0)).toDF("k", "region", "v"),
      overwrite = true, statsCols = Seq("k", "region"))
    st.commit("t", Seq((100L, 2L, 1.0)).toDF("k", "region", "v"),
      overwrite = false, statsCols = Seq("k", "region"))
    st.deleteWhere("t", "k", col("k") === 5) // vector {5}; dirA carried
    // the replace re-inserts key 5 INTO region 2: subtracting 5 from
    // the vector is only legal once dirA's old physical (5, region 1)
    // row is rewritten away — the key-stat probe must widen the
    // rewrite to dirA even though the predicate provably misses it
    st.replaceWhere("t", col("region") === 2,
      Seq((5L, 2L, 99.0), (101L, 2L, 2.0)).toDF("k", "region", "v"),
      statsCols = Seq("k", "region"))
    val rows = st.read("t").where(col("k") === 5).collect()
    assert(rows.length == 1, s"exactly ONE k=5 row must survive: ${rows.toSeq}")
    assert(rows.head.getDouble(2) == 99.0, "and it is the payload's")
    assert(st.read("t").count() == 3L) // {6, 5(new), 101}
  }

  test("splitReplaceWhere finds the boundary past subquery parens and literals") {
    assert(GraftSqlParser.splitReplaceWhere(
      "k IN (SELECT x FROM y) SELECT 1, 2") ==
      Some(("k IN (SELECT x FROM y)", "SELECT 1, 2")))
    assert(GraftSqlParser.splitReplaceWhere(
      "v = 'SELECT not me' VALUES (1, 2)") ==
      Some(("v = 'SELECT not me'", "VALUES (1, 2)")))
    assert(GraftSqlParser.splitReplaceWhere("k > 5").isEmpty,
      "no payload keyword: fall through")
  }

  test("CHECK constraints: add validates existing rows, writes enforce, drop lifts, durable") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE cc1 (k BIGINT, p DOUBLE) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO cc1 VALUES (1, 10.0), (2, 20.0)")
      // an ADD whose expression an existing row violates refuses
      val bad = scala.util.Try(spark.sql(
        "ALTER TABLE cc1 ADD CONSTRAINT p_big CHECK (p >= 15)").collect())
      assert(bad.isFailure &&
        bad.failed.get.getMessage.contains("existing row"), bad.toString)
      spark.sql("ALTER TABLE cc1 ADD CONSTRAINT p_pos CHECK (p > 0)")
      // a violating INSERT refuses in the write job, before any publish
      val (st, view) = GraftTableRegistry.lookup("cc1").get
      val vBefore = st.versions(view).max
      val ins = scala.util.Try(
        spark.sql("INSERT INTO cc1 VALUES (3, -1.0)").collect())
      assert(ins.isFailure, "violating INSERT must refuse")
      assert(st.versions(view).max == vBefore, "no publish on refusal")
      // NULL passes — the SQL CHECK contract
      spark.sql("INSERT INTO cc1 VALUES (4, NULL)")
      // a violating UPDATE refuses too
      val upd = scala.util.Try(
        spark.sql("UPDATE cc1 SET p = -5 WHERE k = 1").collect())
      assert(upd.isFailure, "violating UPDATE must refuse")
      assert(spark.sql("SELECT p FROM cc1 WHERE k = 1").head().getDouble(0)
        == 10.0)
      // DURABLE: a registry wipe (restart) re-materializes the
      // constraint from the catalog and still enforces it
      GraftTableRegistry.clearInMemory()
      val ins2 = scala.util.Try(
        spark.sql("INSERT INTO cc1 VALUES (5, -2.0)").collect())
      assert(ins2.isFailure, "constraints must survive a restart")
      // SHOW CREATE TABLE emits the constraint as an ALTER row
      val stmts = spark.sql("SHOW CREATE TABLE cc1").collect()
        .map(_.getString(0)).toSeq
      assert(stmts.exists(_.startsWith(
        "ALTER TABLE cc1 ADD CONSTRAINT p_pos CHECK (p > 0)")),
        stmts.mkString("\n"))
      // DROP CONSTRAINT lifts enforcement; unknown names refuse unless
      // IF EXISTS
      assert(scala.util.Try(spark.sql(
        "ALTER TABLE cc1 DROP CONSTRAINT nope").collect()).isFailure)
      spark.sql("ALTER TABLE cc1 DROP CONSTRAINT IF EXISTS nope")
      spark.sql("ALTER TABLE cc1 DROP CONSTRAINT p_pos")
      spark.sql("INSERT INTO cc1 VALUES (6, -3.0)")
      assert(spark.sql("SELECT count(*) FROM cc1").head().getLong(0) == 4L)
      spark.sql("DROP TABLE cc1")
    }
  }

  test("CHECK constraints: MERGE enforces on landing rows, tombstones exempt") {
    import spark.implicits._
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE cc2 (k BIGINT, p DOUBLE) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO cc2 VALUES (1, 10.0), (2, 20.0)")
      spark.sql("ALTER TABLE cc2 ADD CONSTRAINT p_pos CHECK (p > 0)")
      // a tombstone whose carried values violate must still DELETE —
      // nothing of it lands
      Seq((1L, -1.0, true)).toDF("k", "p", "del")
        .createOrReplaceTempView("cc2_src")
      spark.sql("""MERGE INTO cc2 USING cc2_src ON cc2.k = cc2_src.k
        WHEN MATCHED AND del THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      assert(spark.sql("SELECT k FROM cc2").collect().map(_.getLong(0)).toSet
        == Set(2L))
      // a violating UPSERT refuses (column form)
      Seq((2L, -9.0)).toDF("k", "np").createOrReplaceTempView("cc2_src2")
      val m = scala.util.Try(spark.sql(
        """MERGE INTO cc2 AS t USING cc2_src2 AS s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET p = s.np""").collect())
      assert(m.isFailure, "violating merge-update must refuse")
      assert(spark.sql("SELECT p FROM cc2 WHERE k = 2").head().getDouble(0)
        == 20.0)
      spark.sql("DROP TABLE cc2")
    }
  }

  test("rowCountFast / DESCRIBE DETAIL num_rows: metadata-only counts, honest NULLs") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE rc1 (k BIGINT, v STRING) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO rc1 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      spark.sql("INSERT INTO rc1 VALUES (4, 'd')")
      val (st, view) = GraftTableRegistry.lookup("rc1").get
      assert(st.rowCountFast(view) == Some(4L))
      // time travel answers from the pinned manifest's dirs
      assert(st.rowCountFast(view, Some(2L)) == Some(3L))
      val d = spark.sql("DESCRIBE DETAIL rc1").head()
      assert(d.getLong(6) == 4L, d.toString)
      // a live deletion vector makes the count non-derivable from
      // metadata (a vector key can suppress later-appended rows too) —
      // NULL, never a wrong number
      spark.sql("DELETE FROM rc1 WHERE k = 2")
      assert(st.rowCountFast(view).isEmpty)
      assert(spark.sql("DESCRIBE DETAIL rc1").head().isNullAt(6))
      // an overwrite discards the vectors: exact again
      spark.sql("INSERT OVERWRITE rc1 VALUES (10, 'x'), (11, 'y')")
      assert(st.rowCountFast(view) == Some(2L))
      spark.sql("DROP TABLE rc1")
    }
  }

  test("subquery predicates in DELETE/UPDATE route through deleteKeys / session SQL") {
    import spark.implicits._
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE sq1 (k BIGINT, g BIGINT, p DOUBLE) " +
        "USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO sq1 VALUES (1, 7, 1.0), (2, 7, 2.0), " +
        "(3, 8, 3.0), (4, 9, 4.0)")
      Seq(7L, 9L).toDF("g").createOrReplaceTempView("sq1_bad")
      val (st, view) = GraftTableRegistry.lookup("sq1").get
      val dirs = st.manifestDirs(view)
      spark.sql("DELETE FROM sq1 WHERE g IN (SELECT g FROM sq1_bad)")
      assert(st.manifestDirs(view) == dirs,
        "subquery DELETE must be a deletion-vector commit")
      assert(spark.sql("SELECT k FROM sq1").collect().map(_.getLong(0)).toSet
        == Set(3L))
      // EXISTS works too (same routing), and the temp view is cleaned up
      spark.sql("UPDATE sq1 SET p = p * 10 WHERE EXISTS " +
        "(SELECT 1 FROM sq1_bad WHERE sq1_bad.g = sq1.g - 1)")
      assert(spark.sql("SELECT p FROM sq1 WHERE k = 3").head().getDouble(0)
        == 30.0)
      assert(!spark.catalog.listTables().collect()
        .exists(_.name.startsWith("graft_dml_")),
        "DML temp views must not leak")
      // a NON-subquery IN list still takes the plain expr path
      spark.sql("INSERT INTO sq1 VALUES (10, 1, 5.0), (11, 1, 6.0)")
      spark.sql("DELETE FROM sq1 WHERE k IN (10, 11)")
      assert(spark.sql("SELECT count(*) FROM sq1").head().getLong(0) == 1L)
      spark.sql("DROP TABLE sq1")
    }
  }

  test("COPY INTO: idempotent per-file landing-zone ingestion") {
    import spark.implicits._
    val root = freshRoot()
    val landing = root + "/landing"
    withRoot(root) {
      spark.sql("CREATE TABLE cp1 (k BIGINT, v STRING) USING graft PRIMARY KEY k")
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .coalesce(1).write.parquet(landing)
      val r1 = spark.sql(
        s"COPY INTO cp1 FROM '$landing' FILEFORMAT = PARQUET").head()
      assert(r1.getLong(2) == 1L && r1.getLong(3) == 2L, r1.toString)
      // re-running the exact statement loads NOTHING and publishes
      // nothing — the per-file fences are in the manifest
      val (st, view) = GraftTableRegistry.lookup("cp1").get
      val v1 = st.versions(view).max
      val r2 = spark.sql(
        s"COPY INTO cp1 FROM '$landing' FILEFORMAT = PARQUET").head()
      assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L, r2.toString)
      assert(st.versions(view).max == v1, "a no-new-file COPY publishes nothing")
      // the landing dir grows: only the NEW file loads
      Seq((3L, "c")).toDF("k", "v").coalesce(1).write.mode("append")
        .parquet(landing)
      val r3 = spark.sql(
        s"COPY INTO cp1 FROM '$landing' FILEFORMAT = PARQUET").head()
      assert(r3.getLong(2) == 1L && r3.getLong(3) == 1L, r3.toString)
      assert(spark.sql("SELECT k FROM cp1").collect().map(_.getLong(0)).toSet
        == Set(1L, 2L, 3L))
      // by-name alignment: a shard MISSING a column lands NULL there;
      // an extra column refuses
      val landing2 = root + "/landing2"
      Seq(Tuple1(9L)).toDF("k").coalesce(1).write.parquet(landing2)
      spark.sql(s"COPY INTO cp1 FROM '$landing2' FILEFORMAT = PARQUET")
      assert(spark.sql("SELECT v FROM cp1 WHERE k = 9").head().isNullAt(0))
      val landing3 = root + "/landing3"
      Seq((10L, "x", 1.0)).toDF("k", "v", "extra")
        .coalesce(1).write.parquet(landing3)
      val bad = scala.util.Try(spark.sql(
        s"COPY INTO cp1 FROM '$landing3' FILEFORMAT = PARQUET").collect())
      assert(bad.isFailure &&
        bad.failed.get.getMessage.contains("not a table column"), bad.toString)
      // CHECK constraints guard the load
      spark.sql("ALTER TABLE cp1 ADD CONSTRAINT k_pos CHECK (k > 0)")
      val landing4 = root + "/landing4"
      Seq((-5L, "neg")).toDF("k", "v").coalesce(1).write.parquet(landing4)
      assert(scala.util.Try(spark.sql(
        s"COPY INTO cp1 FROM '$landing4' FILEFORMAT = PARQUET").collect())
        .isFailure, "a constraint-violating load must refuse")
      spark.sql("DROP TABLE cp1")
    }
  }

  test("COPY INTO: csv with header and PATTERN globbing") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE cp2 (k BIGINT, v STRING) USING graft")
      val landing = java.nio.file.Paths.get(root, "csvland")
      java.nio.file.Files.createDirectories(landing)
      java.nio.file.Files.writeString(landing.resolve("batch1.csv"),
        "k,v\n1,a\n2,b\n")
      java.nio.file.Files.writeString(landing.resolve("skipme.txt"),
        "k,v\n9,z\n")
      val r = spark.sql(s"COPY INTO cp2 FROM '$landing' FILEFORMAT = CSV " +
        "PATTERN = 'batch*.csv'").head()
      assert(r.getLong(2) == 1L && r.getLong(3) == 2L, r.toString)
      assert(spark.sql("SELECT count(*) FROM cp2").head().getLong(0) == 2L)
      spark.sql("DROP TABLE cp2")
    }
  }

  test("OPTIMIZE WHERE rewrites only the touched dirs; ALTER CLUSTER BY re-declares layout") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE ow1 (k BIGINT, v DOUBLE) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO ow1 VALUES (1, 1.0), (2, 2.0)")
      spark.sql("INSERT INTO ow1 VALUES (100, 100.0), (101, 101.0)")
      spark.sql("INSERT INTO ow1 VALUES (102, 102.0), (103, 103.0)")
      val (st, view) = GraftTableRegistry.lookup("ow1").get
      val before = st.manifestDirs(view)
      val lowDir = before(1) // k in [1,2]
      spark.sql("OPTIMIZE ow1 WHERE k >= 50")
      val after = st.manifestDirs(view)
      assert(after.contains(lowDir),
        s"the provably-unmatched dir must carry: $before -> $after")
      assert(after.size < before.size, "the touched dirs must compact")
      assert(spark.sql("SELECT count(*) FROM ow1").head().getLong(0) == 6L,
        "OPTIMIZE WHERE is layout-only")
      // a predicate touching nothing publishes nothing
      val v = st.versions(view).max
      spark.sql("OPTIMIZE ow1 WHERE k >= 1000000")
      assert(st.versions(view).max == v)
      // ALTER CLUSTER BY re-declares the layout: recorded, durable,
      // validated against the schema
      spark.sql("ALTER TABLE ow1 CLUSTER BY (v, k)")
      assert(GraftTableRegistry.lookupCluster("ow1") == Seq("v", "k"))
      GraftTableRegistry.clearInMemory()
      assert(GraftTableRegistry.lookupCluster("ow1") == Seq("v", "k"),
        "the re-declared layout must survive a restart")
      assert(scala.util.Try(spark.sql(
        "ALTER TABLE ow1 CLUSTER BY (nope)").collect()).isFailure)
      spark.sql("ALTER TABLE ow1 CLUSTER BY NONE")
      assert(GraftTableRegistry.lookupCluster("ow1").isEmpty)
      spark.sql("DROP TABLE ow1")
    }
  }

  test("INSERT column list: named subset binds, unnamed columns NULL, key required") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE il1 (k BIGINT, v STRING, p DOUBLE) " +
        "USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO il1 (k, p) VALUES (1, 1.5)")
      val r1 = spark.sql("SELECT v, p FROM il1 WHERE k = 1").head()
      assert(r1.isNullAt(0) && r1.getDouble(1) == 1.5, r1.toString)
      // list order wins, not table order
      spark.sql("INSERT INTO il1 (p, k) VALUES (2.5, 2)")
      assert(spark.sql("SELECT p FROM il1 WHERE k = 2").head().getDouble(0)
        == 2.5)
      // a keyed table must name its key
      val noKey = scala.util.Try(spark.sql(
        "INSERT INTO il1 (v, p) VALUES ('x', 1.0)").collect())
      assert(noKey.isFailure &&
        noKey.failed.get.getMessage.contains("PRIMARY KEY"), noKey.toString)
      // unknown and duplicate names refuse
      assert(scala.util.Try(spark.sql(
        "INSERT INTO il1 (k, nope) VALUES (3, 1)").collect()).isFailure)
      assert(scala.util.Try(spark.sql(
        "INSERT INTO il1 (k, k) VALUES (3, 4)").collect()).isFailure)
      // a CHECK over an unnamed column sees the NULL it will store
      spark.sql("ALTER TABLE il1 ADD CONSTRAINT v_short CHECK (length(v) < 5)")
      spark.sql("INSERT INTO il1 (k, p) VALUES (3, 0.5)") // NULL v passes
      assert(scala.util.Try(spark.sql(
        "INSERT INTO il1 (k, v) VALUES (4, 'toolong')").collect()).isFailure)
      spark.sql("DROP TABLE il1")
    }
  }

  test("MERGE USING (SELECT ...) AS s: inline subquery sources in every form") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE ms1 (k BIGINT, p DOUBLE) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO ms1 VALUES (1, 1.0), (2, 2.0)")
      // general when-form with an inline source
      spark.sql("""MERGE INTO ms1 AS t USING
        (SELECT 1 AS k, 10.0 AS np UNION ALL SELECT 3, 30.0) AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET p = s.np
        WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, s.np)""")
      val m = spark.sql("SELECT k, p FROM ms1").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m == Map(1L -> 10.0, 2L -> 2.0, 3L -> 30.0), m.toString)
      // upsert-all form (no source-referencing expressions, alias optional)
      spark.sql("MERGE INTO ms1 USING (SELECT CAST(4 AS BIGINT) AS k, " +
        "40.0 AS p) AS s ON ms1.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      assert(spark.sql("SELECT p FROM ms1 WHERE k = 4").head().getDouble(0)
        == 40.0)
      // a subquery source without an alias refuses with a clear error
      val noAlias = scala.util.Try(spark.sql(
        """MERGE INTO ms1 USING (SELECT 1 AS k, 5.0 AS np) ON ms1.k = k
           WHEN MATCHED THEN UPDATE SET p = np""").collect())
      assert(noAlias.isFailure &&
        noAlias.failed.get.getMessage.contains("needs an alias"),
        noAlias.toString)
      // the cardinality probe still guards a duplicate-key subquery
      val dup = scala.util.Try(spark.sql(
        """MERGE INTO ms1 AS t USING
          (SELECT 1 AS k, 1.0 AS np UNION ALL SELECT 1, 2.0) AS s
          ON t.k = s.k WHEN MATCHED THEN UPDATE SET p = s.np""").collect())
      assert(dup.isFailure &&
        dup.failed.get.getMessage.contains("at most one source row"),
        dup.toString)
      spark.sql("DROP TABLE ms1")
    }
  }

  test("CREATE OR REPLACE TABLE: new definition, history preserved, constraints dropped") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE cor1 (k BIGINT, v STRING) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO cor1 VALUES (1, 'a'), (2, 'b')")
      spark.sql("ALTER TABLE cor1 ADD CONSTRAINT v_ok CHECK (length(v) > 0)")
      spark.sql("CREATE OR REPLACE TABLE cor1 USING graft PRIMARY KEY k " +
        "AS SELECT CAST(10 AS BIGINT) AS k, CAST(7 AS BIGINT) AS n")
      // the new definition: new schema, new content
      val r = spark.sql("SELECT k, n FROM cor1").collect()
      assert(r.length == 1 && r.head.getLong(0) == 10L, r.mkString(","))
      // the OLD snapshot stays time-travelable
      assert(spark.sql("SELECT * FROM cor1 VERSION AS OF 2").count() == 2L)
      // constraints dropped with the old definition
      assert(GraftTableRegistry.lookupChecks("cor1").isEmpty)
      // the key re-registered: keyed DML works on the new shape
      spark.sql("UPDATE cor1 SET n = 8 WHERE k = 10")
      assert(spark.sql("SELECT n FROM cor1").head().getLong(0) == 8L)
      // OR REPLACE + IF NOT EXISTS refuses
      assert(scala.util.Try(spark.sql(
        "CREATE OR REPLACE TABLE IF NOT EXISTS cor1 (k BIGINT) USING graft")
        .collect()).isFailure)
      // OR REPLACE on a fresh name is a plain CREATE
      spark.sql("CREATE OR REPLACE TABLE cor2 (k BIGINT) USING graft")
      spark.sql("INSERT INTO cor2 VALUES (5)")
      assert(spark.sql("SELECT count(*) FROM cor2").head().getLong(0) == 1L)
      spark.sql("DROP TABLE cor1")
      spark.sql("DROP TABLE cor2")
    }
  }

  test("racing replaceWhere writers under retryOnConflict stay consistent") {
    import spark.implicits._
    val root = freshRoot()
    val st = new graft.sources.SnapshotStore(spark, root)
    val seed = (0 until 4).flatMap(r => Seq((r * 1000L, r.toLong, -1L)))
      .toDF("k", "region", "iter")
    st.commit("t", seed, overwrite = true, statsCols = Seq("k"))
    val iters = 5
    val threads = (0 until 4).map { r =>
      new Thread(() => {
        for (it <- 0 until iters) {
          st.retryOnConflict(attempts = 64) {
            st.replaceWhere("t",
              org.apache.spark.sql.functions.col("region") === r,
              Seq((r * 1000L, r.toLong, it.toLong), (r * 1000L + it + 1, r.toLong, it.toLong))
                .toDF("k", "region", "iter"),
              statsCols = Seq("k"))
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // every replace published exactly once: 1 seed + 4*5 commits
    assert(st.versions("t").max == 21L, st.versions("t").toString)
    // each region holds exactly its LAST payload (2 rows, iter = 4)
    val fin = st.read("t").collect()
      .map(row => (row.getLong(1), row.getLong(2))).toSeq
    assert(fin.length == 8, fin.toString)
    assert(fin.forall(_._2 == (iters - 1).toLong), fin.toString)
    (0 until 4).foreach { r =>
      assert(fin.count(_._1 == r.toLong) == 2, s"region $r: $fin")
    }
  }

  test("SHOW CREATE TABLE falls through for unregistered names") {
    val e = scala.util.Try(
      spark.sql("SHOW CREATE TABLE definitely_not_registered_xyz").collect())
    assert(e.isFailure, "the stock parser should reject the unknown table")
    assert(!e.failed.get.getMessage.contains("SHOW CREATE TABLE definitely"),
      "the failure must come from the stock resolution path, not our command")
  }
}
