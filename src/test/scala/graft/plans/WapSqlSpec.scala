package graft.plans

import graft.SparkSpec

/** Round-16: the WAP (write–audit–publish) lifecycle in pure SQL —
  * `ALTER TABLE t CREATE|FAST FORWARD|REBASE|DROP BRANCH b`, with the
  * branch registered as the DML-able `` `t@b` `` (the quoted-ident
  * surface carries the whole statement set onto it).
  */
class WapSqlSpec extends SparkSpec {

  private var n = 0
  private def withRoot[T](body: String => T): T = {
    n += 1
    val root =
      graft.sources.Scratch.processScoped("wapsql_spec", "spec") + s"/case$n"
    spark.conf.set("spark.graft.store.root", root)
    try body(root) finally spark.conf.unset("spark.graft.store.root")
  }

  test("branch carries the binding; OCC refusal on a moved main; " +
      "REBASE recovers; FAST FORWARD publishes atomically") {
    withRoot { _ =>
      // CTAS, not CREATE+INSERT: the empty seed dir a schema-CREATE
      // publishes is statless and any keyed branch merge would
      // localize (rewrite) it — which correctly disqualifies REBASE
      // (base rewritten). A stats-covered base keeps the branch's
      // writes append-only, the shape rebase exists for.
      spark.sql("CREATE TABLE wp1 USING graft PRIMARY KEY k " +
        "AS SELECT CAST(1 AS BIGINT) AS k, CAST(1.0 AS DOUBLE) AS v")
      spark.sql("ALTER TABLE wp1 ADD CONSTRAINT vpos CHECK (v >= 0)")
      spark.sql("ALTER TABLE wp1 CREATE BRANCH audit")
      // the branch took the key AND the constraints
      assert(GraftTableRegistry.lookupKey("wp1@audit").contains("k"))
      spark.sql("INSERT INTO `wp1@audit` VALUES (2, 2.0)")
      val viol = scala.util.Try(
        spark.sql("INSERT INTO `wp1@audit` VALUES (3, -1.0)").collect())
      assert(viol.isFailure, "CHECK constraints must guard the branch")
      // keyed DML + time travel work on the branch, isolated from main
      spark.sql("UPDATE `wp1@audit` SET v = 20.0 WHERE k = 2")
      assert(spark.sql("SELECT count(*) FROM wp1").head().getLong(0) == 1L)
      // main moves → the audit is stale → FAST FORWARD refuses
      spark.sql("INSERT INTO wp1 VALUES (9, 9.0)")
      val stale = scala.util.Try(
        spark.sql("ALTER TABLE wp1 FAST FORWARD BRANCH audit").collect())
      assert(stale.isFailure &&
        stale.failed.get.getMessage.contains("fast-forward would drop"),
        stale.toString)
      // REBASE re-points the append-only branch onto main's head…
      spark.sql("ALTER TABLE wp1 REBASE BRANCH audit")
      assert(spark.sql("SELECT count(*) FROM `wp1@audit`").head()
        .getLong(0) == 3L, "rebased branch = main's head + branch appends")
      // …then the re-audited branch publishes
      spark.sql("ALTER TABLE wp1 FAST FORWARD BRANCH audit")
      assert(spark.sql("SELECT count(*) FROM wp1").head().getLong(0) == 3L)
      assert(spark.sql("SELECT v FROM wp1 WHERE k = 2").head()
        .getDouble(0) == 20.0)
      // the listing shows the live branch with its head version…
      val br = spark.sql("SHOW BRANCHES wp1").collect()
      assert(br.length == 1 && br.head.getString(1) == "audit" &&
        br.head.getLong(2) >= 2L, br.toSeq.toString)
      spark.sql("ALTER TABLE wp1 DROP BRANCH audit")
      assert(GraftTableRegistry.lookup("wp1@audit").isEmpty)
      // main still reads (branch-local dirs live as foreign refs)
      assert(spark.sql("SELECT count(*) FROM wp1").head().getLong(0) == 3L)
      spark.sql("DROP TABLE wp1")
    }
  }

  test("branch DML claims fall through for unregistered tables") {
    val e = intercept[Exception](
      spark.sql("ALTER TABLE nope_wap CREATE BRANCH b").collect())
    assert(!e.getMessage.contains("graft"), e.getMessage)
  }
}
