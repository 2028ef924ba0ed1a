package graft.plans

import graft.SparkSpec

/** Round-16: the SQL spelling of the multi-view syncpoint —
  * `PUBLISH SYNCPOINT (t1, t2, …)` pins the named tables' current
  * versions atomically, `<t> SYNC AS OF LATEST|<id>` reads a table AS
  * OF its pinned version, so the lambda serving splice's consistency
  * guarantee (q150's Scala-only publishSync/readSync) is reachable
  * from pure SQL.
  */
class SyncpointSqlSpec extends SparkSpec {

  private var n = 0
  private def freshRoot(): String = {
    n += 1
    graft.sources.Scratch.processScoped("syncsql_spec", "spec") + s"/case$n"
  }

  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set("spark.graft.store.root", root)
    try body finally spark.conf.unset("spark.graft.store.root")
  }

  test("PUBLISH SYNCPOINT + SYNC AS OF LATEST: a mid-cycle commit is " +
      "invisible to sync readers until the next syncpoint") {
    val root = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE sp_batch (d STRING, total DOUBLE) USING graft")
      spark.sql("CREATE TABLE sp_speed (d STRING, live DOUBLE) USING graft")
      // cycle 1 lands both views, then publishes ONE syncpoint
      spark.sql("INSERT INTO sp_batch VALUES ('d1', 100.0)")
      spark.sql("INSERT INTO sp_speed VALUES ('d1', 1.0)")
      val pins = spark.sql("PUBLISH SYNCPOINT (sp_batch, sp_speed)").collect()
      assert(pins.length == 2 && pins.forall(_.getLong(0) == 1L),
        pins.mkString(", "))
      // cycle 2 is IN PROGRESS: batch already advanced, speed not yet —
      // the exact splice-anomaly window the reference's three
      // independent writes leave open
      spark.sql("INSERT INTO sp_batch VALUES ('d2', 200.0)")
      // plain reads see the torn state…
      assert(spark.sql("SELECT count(*) FROM sp_batch").head().getLong(0) == 2L)
      // …sync readers see only the published cycle, BOTH views
      assert(spark.sql("SELECT count(*) FROM sp_batch SYNC AS OF LATEST")
        .head().getLong(0) == 1L)
      assert(spark.sql("SELECT count(*) FROM sp_speed SYNC AS OF LATEST")
        .head().getLong(0) == 1L)
      // the sync read COMPOSES — one splice-free join of both views
      val joined = spark.sql(
        """SELECT b.d, b.total, s.live
           FROM sp_batch SYNC AS OF LATEST b
           JOIN sp_speed SYNC AS OF LATEST s ON b.d = s.d""").collect()
      assert(joined.length == 1 && joined.head.getString(0) == "d1")
      // cycle 2 completes and publishes: sync readers move atomically
      spark.sql("INSERT INTO sp_speed VALUES ('d2', 2.0)")
      spark.sql("PUBLISH SYNCPOINT (sp_batch, sp_speed)")
      assert(spark.sql("SELECT count(*) FROM sp_batch SYNC AS OF LATEST")
        .head().getLong(0) == 2L)
      // the OLD cycle stays readable by id — syncpoint time travel
      assert(spark.sql("SELECT count(*) FROM sp_batch SYNC AS OF 1")
        .head().getLong(0) == 1L)
      spark.sql("DROP TABLE sp_batch"); spark.sql("DROP TABLE sp_speed")
    }
  }

  test("refusals: cross-root pins, unregistered names, no syncpoint yet") {
    val root = freshRoot()
    val other = freshRoot()
    withRoot(root) {
      spark.sql("CREATE TABLE sp_a (k BIGINT) USING graft")
      spark.sql(s"CREATE TABLE sp_b (k BIGINT) USING graft LOCATION '$other'")
      spark.sql("INSERT INTO sp_a VALUES (1)")
      spark.sql("INSERT INTO sp_b VALUES (1)")
      val cross = scala.util.Try(
        spark.sql("PUBLISH SYNCPOINT (sp_a, sp_b)").collect())
      assert(cross.isFailure &&
        cross.failed.get.getMessage.contains("one store root"),
        cross.toString)
      val unreg = scala.util.Try(
        spark.sql("PUBLISH SYNCPOINT (sp_a, no_such)").collect())
      assert(unreg.isFailure, unreg.toString)
      // SYNC AS OF before any syncpoint refuses loudly, not empty
      val early = scala.util.Try(
        spark.sql("SELECT * FROM sp_a SYNC AS OF LATEST").collect())
      assert(early.isFailure &&
        early.failed.get.getMessage.contains("no published syncpoint"),
        early.toString)
      spark.sql("DROP TABLE sp_a"); spark.sql("DROP TABLE sp_b")
    }
  }
}
