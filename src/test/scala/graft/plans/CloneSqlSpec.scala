package graft.plans

import graft.SparkSpec

/** Round-16: `CREATE TABLE t2 SHALLOW|DEEP CLONE t1 [VERSION AS OF n]
  * [LOCATION '…']` — Delta's CLONE spelling over the store's zero-copy
  * cloneView / independent deepClone, with the source binding (key,
  * layout, constraints) carried onto the clone.
  */
class CloneSqlSpec extends SparkSpec {

  private var n = 0
  private def withRoot[T](body: String => T): T = {
    n += 1
    val root =
      graft.sources.Scratch.processScoped("clonesql_spec", "spec") + s"/case$n"
    spark.conf.set("spark.graft.store.root", root)
    try body(root) finally spark.conf.unset("spark.graft.store.root")
  }

  test("SHALLOW CLONE: zero-copy, pinned, binding carried, divergent") {
    withRoot { _ =>
      spark.sql("CREATE TABLE cl_src (k BIGINT, v DOUBLE) USING graft " +
        "PRIMARY KEY k")
      spark.sql("INSERT INTO cl_src VALUES (1, 1.0), (2, 2.0)")
      spark.sql("ALTER TABLE cl_src ADD CONSTRAINT vnn CHECK (v IS NOT NULL)")
      val (st, _) = GraftTableRegistry.lookup("cl_src").get
      val pin = st.versions("cl_src").max
      spark.sql("INSERT INTO cl_src VALUES (3, 3.0)")
      spark.sql(s"CREATE TABLE cl_c SHALLOW CLONE cl_src VERSION AS OF $pin")
      assert(st.manifestDirs("cl_c").forall(_.startsWith("../../")),
        "zero-copy: the clone's v1 is foreign refs only")
      assert(spark.sql("SELECT count(*) FROM cl_c").head().getLong(0) == 2L,
        "pinned AS OF the pre-insert version")
      // the binding carried: key → keyed DML; constraint → guarded
      assert(GraftTableRegistry.lookupKey("cl_c").contains("k"))
      spark.sql("UPDATE cl_c SET v = 9.0 WHERE k = 1")
      val viol = scala.util.Try(
        spark.sql("INSERT INTO cl_c VALUES (9, NULL)").collect())
      assert(viol.isFailure, "the CHECK constraint must carry to the clone")
      // divergence: neither side sees the other's writes
      assert(spark.sql("SELECT count(*) FROM cl_src").head().getLong(0) == 3L)
      assert(spark.sql("SELECT v FROM cl_src WHERE k = 1").head()
        .getDouble(0) == 1.0)
      // durable registration survives a restart
      GraftTableRegistry.clearInMemory()
      assert(spark.sql("SELECT count(*) FROM cl_c").head().getLong(0) == 2L)
      // a shallow clone cannot be placed elsewhere
      val badLoc = scala.util.Try(spark.sql(
        "CREATE TABLE cl_x SHALLOW CLONE cl_src LOCATION '/tmp/elsewhere'")
        .collect())
      assert(badLoc.isFailure &&
        badLoc.failed.get.getMessage.contains("DEEP CLONE"), badLoc.toString)
      spark.sql("DROP TABLE cl_c"); spark.sql("DROP TABLE cl_src")
    }
  }

  test("DEEP CLONE at a LOCATION is fully independent of the source") {
    withRoot { root =>
      spark.sql("CREATE TABLE cd_src (k BIGINT, v DOUBLE) USING graft " +
        "PRIMARY KEY k")
      spark.sql("INSERT INTO cd_src VALUES (1, 1.0), (2, 2.0)")
      val other = root + "/other_root"
      spark.sql(s"CREATE TABLE cd_c DEEP CLONE cd_src LOCATION '$other'")
      val (cst, _) = GraftTableRegistry.lookup("cd_c").get
      assert(java.nio.file.Paths.get(cst.root).toAbsolutePath.normalize
        .toString.endsWith("other_root"))
      assert(cst.manifestDirs("cd_c").forall(!_.contains("/")),
        "a deep clone owns LOCAL copies, no foreign refs")
      // source data can vanish entirely — the deep clone still reads
      spark.sql("DROP TABLE cd_src")
      graft.sources.Scratch.deleteRecursively(
        new java.io.File(root, "cd_src"))
      assert(spark.sql("SELECT count(*) FROM cd_c").head().getLong(0) == 2L)
      spark.sql("DROP TABLE cd_c")
    }
  }

  test("CLONE refusals: unregistered source falls through, taken name refuses") {
    withRoot { _ =>
      val e = intercept[Exception](
        spark.sql("CREATE TABLE x SHALLOW CLONE no_such_src").collect())
      assert(!e.getMessage.contains("graft"), e.getMessage)
      spark.sql("CREATE TABLE cr_a (k BIGINT) USING graft")
      spark.sql("CREATE TABLE cr_b (k BIGINT) USING graft")
      val taken = scala.util.Try(
        spark.sql("CREATE TABLE cr_b SHALLOW CLONE cr_a").collect())
      assert(taken.isFailure &&
        taken.failed.get.getMessage.contains("already a registered"),
        taken.toString)
      spark.sql("DROP TABLE cr_a"); spark.sql("DROP TABLE cr_b")
    }
  }
}
