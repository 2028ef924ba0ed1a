package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 SQL-tier durability and DDL layout: the on-disk catalog
  * (bindings survive a "restart" = in-memory registry wipe), wall-clock
  * time travel, CLUSTER BY at CREATE, opt-in PRIMARY KEY enforcement,
  * and the CHANGES bound extensions.
  */
class DurableCatalogSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshRoot(): String = {
    n += 1
    graft.sources.Scratch.processScoped("durcat_spec", "spec") + s"/case$n"
  }

  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set("spark.graft.store.root", root)
    try body finally spark.conf.unset("spark.graft.store.root")
  }

  test("CREATE TABLE survives a registry wipe: SELECT/DML/SHOW resolve from disk") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE dc1 (k BIGINT, v STRING) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO dc1 VALUES (1, 'a'), (2, 'b')")
      // "restart": the process-global registry dies with the JVM
      GraftTableRegistry.clearInMemory()
      // plain SELECT by name — the durable binding re-materializes
      assert(spark.sql("SELECT k, v FROM dc1").count() == 2L)
      GraftTableRegistry.clearInMemory()
      // keyed DML needs the persisted key too
      spark.sql("UPDATE dc1 SET v = 'z' WHERE k = 2")
      spark.sql("INSERT INTO dc1 VALUES (3, 'c')")
      spark.sql("DELETE FROM dc1 WHERE k = 1")
      val m = spark.sql("SELECT k, v FROM dc1").as[(Long, String)]
        .collect().toMap
      assert(m == Map(2L -> "z", 3L -> "c"), m.toString)
      GraftTableRegistry.clearInMemory()
      val shown = spark.sql("SHOW GRAFT TABLES").collect()
      assert(shown.exists(_.getString(0) == "dc1"),
        "SHOW lists disk-backed bindings after a wipe")
      // DROP removes the durable binding: a later wipe + SELECT fails
      spark.sql("DROP TABLE dc1")
      GraftTableRegistry.clearInMemory()
      assert(scala.util.Try(spark.sql("SELECT * FROM dc1").collect()).isFailure,
        "after DROP the binding must not resurrect from disk")
    }
  }

  test("a LOCATION table persists into its own root when no catalog root is set") {
    val root = freshRoot()
    GraftTableRegistry.unregister("dc2")
    spark.sql(s"CREATE TABLE dc2 (k BIGINT, v STRING) USING graft " +
      s"PRIMARY KEY k LOCATION '$root'")
    spark.sql("INSERT INTO dc2 VALUES (1, 'a')")
    GraftTableRegistry.clearInMemory()
    // discoverable by pointing the catalog root at that location
    withRoot(root) {
      assert(spark.sql("SELECT * FROM dc2").count() == 1L)
    }
    GraftTableRegistry.clearInMemory()
  }

  test("temp views shadow a registered name (the catalog never steals a resolution)") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE dc3 (k BIGINT) USING graft")
      spark.sql("INSERT INTO dc3 VALUES (1)")
      Seq(42L, 43L).toDF("k").createOrReplaceTempView("dc3")
      assert(spark.sql("SELECT * FROM dc3").count() == 2L,
        "the temp view wins the name")
      spark.catalog.dropTempView("dc3")
      assert(spark.sql("SELECT * FROM dc3").count() == 1L)
      spark.sql("DROP TABLE dc3")
    }
  }

  test("TIMESTAMP AS OF reads the snapshot a reader at that instant saw") {
    val root = freshRoot()
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2L, "b")).toDF("k", "v"), overwrite = false)
    GraftTableRegistry.register("dc4", st, "t", keyCol = "k")
    val t1 = st.commitTimestamp("t", 1L)
    val t2 = st.commitTimestamp("t", 2L)
    assert(spark.sql(s"SELECT * FROM dc4 TIMESTAMP AS OF '$t1'").count() == 1L)
    assert(spark.sql(s"SELECT * FROM dc4 TIMESTAMP AS OF '$t2'").count() == 2L)
    // ISO form resolves too (far future ⇒ latest)
    assert(spark.sql(
      "SELECT * FROM dc4 TIMESTAMP AS OF '2999-01-01'").count() == 2L)
    val early = intercept[Exception](spark.sql(
      s"SELECT * FROM dc4 TIMESTAMP AS OF '${t1 - 10}'").collect())
    assert(early.getMessage.contains("predates"), early.getMessage)
    val bad = intercept[Exception](spark.sql(
      "SELECT * FROM dc4 TIMESTAMP AS OF 'not-a-time'").collect())
    assert(bad.getMessage.contains("expected epoch millis"), bad.getMessage)
    // a trailing timezone offset must refuse, not silently resolve two
    // hours off (SimpleDateFormat.parse ignores trailing text)
    val tz = intercept[Exception](spark.sql(
      "SELECT * FROM dc4 TIMESTAMP AS OF '2026-01-01 10:00:00+02:00'").collect())
    assert(tz.getMessage.contains("expected epoch millis"), tz.getMessage)
    // inside a string literal the clause is left verbatim
    val lit = spark.sql("SELECT 'x TIMESTAMP AS OF \\'1\\'' AS s").head.getString(0)
    assert(lit == "x TIMESTAMP AS OF '1'")
    // an UNREGISTERED name is never hijacked — the statement reaches
    // the stock parser (which owns TIMESTAMP AS OF for its own tables)
    val native = intercept[Exception](spark.sql(
      "SELECT * FROM no_such_graft TIMESTAMP AS OF '1'").collect())
    assert(!native.getMessage.contains("registered"), native.getMessage)
    GraftTableRegistry.unregister("dc4")
  }

  test("CLUSTER BY at CREATE: inserts land range-clustered, box prune skips on a fresh table") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE dc5 (a BIGINT, b BIGINT, v STRING) USING graft " +
        "PRIMARY KEY a CLUSTER BY (a, b)")
      // two inserts, NO OPTIMIZE ever — the declared layout alone must
      // give multi-dir envelopes a 2-D box query can skip
      val rows = (0L until 512L).map(i => (i % 32, i / 32, s"r$i"))
      rows.toDF("a", "b", "v").createOrReplaceTempView("dc5_src")
      spark.sql("INSERT INTO dc5 SELECT a, b, v FROM dc5_src WHERE a < 16")
      spark.sql("INSERT INTO dc5 SELECT a, b, v FROM dc5_src WHERE a >= 16")
      val (st, view) = GraftTableRegistry.lookup("dc5").get
      val dirs = st.manifestDirs(view)
      assert(dirs.size > 3, s"clustered inserts should land multiple range dirs: $dirs")
      val (keep, skip) = st.pruneDirsBox(view,
        Seq(("a", "0", "3"), ("b", "0", "3")))
      assert(skip.nonEmpty, s"the 2-D box prune must skip dirs: kept=$keep")
      val expected = rows.filter(r => r._1 <= 3 && r._2 <= 3).toSet
      val got = st.readPrunedBox(view, Seq(("a", "0", "3"), ("b", "0", "3")))
        .as[(Long, Long, String)].collect().toSet
      assert(got == expected, s"pruned read must be exact: ${got.size} vs ${expected.size}")
      // the durable binding carries the clustering across a wipe
      GraftTableRegistry.clearInMemory()
      spark.sql("INSERT INTO dc5 VALUES (1, 1, 'late')")
      assert(GraftTableRegistry.lookupCluster("dc5") == Seq("a", "b"))
      spark.sql("DROP TABLE dc5")
    }
  }

  test("PRIMARY KEY enforcement is opt-in: refusals name the key; default stays informational") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE dc6 (k BIGINT, v STRING) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO dc6 VALUES (1, 'a')")
      // default (informational, like Delta): the duplicate lands, and
      // an UPDATE-as-merge then carries BOTH copies (the documented
      // consequence of the informational contract)
      spark.sql("INSERT INTO dc6 VALUES (1, 'dup')")
      assert(spark.sql("SELECT * FROM dc6").count() == 2L)
      spark.sql("UPDATE dc6 SET v = 'u' WHERE k = 1")
      assert(spark.sql("SELECT * FROM dc6 WHERE v = 'u'").count() == 2L,
        "informational PK: the duplicated key updates both copies")
      spark.conf.set("spark.graft.sql.enforcePrimaryKey", "true")
      try {
        val e1 = intercept[Exception](
          spark.sql("INSERT INTO dc6 VALUES (1, 'again')"))
        assert(e1.getMessage.contains("already exists") &&
          e1.getMessage.contains("`k` = 1"), e1.getMessage)
        val e2 = intercept[Exception](
          spark.sql("INSERT INTO dc6 VALUES (5, 'x'), (5, 'y')"))
        assert(e2.getMessage.contains("repeats PRIMARY KEY"), e2.getMessage)
        // a clean insert still lands under enforcement
        spark.sql("INSERT INTO dc6 VALUES (2, 'b')")
        assert(spark.sql("SELECT * FROM dc6").count() == 3L)
      } finally spark.conf.unset("spark.graft.sql.enforcePrimaryKey")
      spark.sql("DROP TABLE dc6")
    }
  }

  test("hammered catalog writers: concurrent upserts all land (link(2) OCC + re-apply)") {
    val root = freshRoot()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val threads = (0 until 8).map { i =>
      new Thread(() => GraftCatalog.upsert(root,
        GraftCatalog.Binding(s"ham$i", root, s"v$i", Some("k"), Nil)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val m = GraftCatalog.load(root)
    assert(m.keySet == (0 until 8).map(i => s"ham$i").toSet, m.keySet)
    GraftCatalog.remove(root, "ham3")
    val m2 = GraftCatalog.load(root)
    assert(!m2.contains("ham3") && m2.size == 7,
      "remove drops exactly one binding, the others survive")
    // idempotent no-op mutations publish nothing
    GraftCatalog.remove(root, "ham3")
    assert(GraftCatalog.load(root).size == 7)
  }

  test("RESTORE TO TIMESTAMP AS OF rolls back to the instant's snapshot") {
    val root = freshRoot()
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "good")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2L, "bad")).toDF("k", "v"), overwrite = true)
    GraftTableRegistry.register("dc8", st, "t", keyCol = "k")
    val t1 = st.commitTimestamp("t", 1L)
    val r = spark.sql(s"RESTORE TABLE dc8 TO TIMESTAMP AS OF '$t1'").head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 3L, r.toString)
    assert(st.read("t").select("v").head.getString(0) == "good")
    GraftTableRegistry.unregister("dc8")
  }

  test("bare OPTIMIZE re-clusters along a DDL-declared CLUSTER BY instead of destroying it") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE dc9 (a BIGINT, b BIGINT) USING graft CLUSTER BY (a, b)")
      (0 until 4).foreach(i => spark.sql(
        s"INSERT INTO dc9 SELECT id % 32, (id + $i) % 32 " +
          "FROM range(0, 256)"))
      val (st, view) = GraftTableRegistry.lookup("dc9").get
      spark.sql("OPTIMIZE dc9") // no CLUSTER BY clause
      val (_, skipped) = st.pruneDirsBox(view, Seq(("a", "0", "7"), ("b", "0", "7")))
      assert(skipped.nonEmpty,
        "bare OPTIMIZE must preserve the declared layout (box prune still skips)")
      spark.sql("DROP TABLE dc9")
    }
  }

  test("CHANGES ... TO LATEST and timestamp bounds resolve through commit timestamps") {
    val root = freshRoot()
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((3L, "c")).toDF("k", "v"), overwrite = false)
    st.mergeInto("t", Seq((2L, "B2")).toDF("k", "v"), "k")
    GraftTableRegistry.register("dc7", st, "t", keyCol = "k")
    val latest = spark.sql("SELECT change_type, k FROM dc7 CHANGES FROM 1 TO LATEST")
      .as[(String, Long)].collect().toSet
    assert(latest == Set(("insert", 3L), ("update", 2L)), latest.toString)
    val t1 = st.commitTimestamp("t", 1L)
    val viaTs = spark.sql(
      s"SELECT change_type, k FROM dc7 CHANGES FROM TIMESTAMP '$t1' TO LATEST")
      .as[(String, Long)].collect().toSet
    assert(viaTs == latest, viaTs.toString)
    // the idle poll: head IS version 3, so FROM 3 TO LATEST is an
    // EMPTY feed (not an error — a poller loops on this)
    assert(spark.sql("SELECT * FROM dc7 CHANGES FROM 3 TO LATEST").isEmpty)
    // an explicit inversion still refuses (a reversed feed would flip
    // deletes into inserts)
    val inv = intercept[Exception](spark.sql(
      "SELECT * FROM dc7 CHANGES FROM 3 TO 2 WHERE 1=1").collect())
    assert(inv.getMessage.contains("ascend"), inv.getMessage)
    GraftTableRegistry.unregister("dc7")
  }
}
