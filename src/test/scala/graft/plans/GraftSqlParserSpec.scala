package graft.plans

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The SQL surface for the native as-of join: `ASOF JOIN` statements
  * parse (GraftSqlParser), resolve (ResolveGraftAsOfJoin), and plan to
  * the same AsOfJoinExec as the column API — row-identical to it both
  * directions — while every other statement passes through the stock
  * parser untouched.
  */
class GraftSqlParserSpec extends SparkSpec {
  import spark.implicits._

  private def views(): Unit = {
    Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (3L, 1L, "d"))
      .toDF("k", "t", "tag").createOrReplaceTempView("sql_l")
    Seq((1L, 10L, 100.0), (1L, 10L, 200.0), (1L, 4L, 50.0),
      (2L, 7L, 7.5), (2L, 8L, 9.9), (9L, 1L, 1.0))
      .toDF("rk", "rt", "v").createOrReplaceTempView("sql_r")
  }

  test("backward ASOF JOIN: plans to AsOfJoinExec, rows equal the column API") {
    views()
    val df = spark.sql(
      """SELECT tag, v AS got FROM sql_l ASOF JOIN sql_r
         ON k = rk AND t >= rt""")
    assert(df.queryExecution.sparkPlan.exists(_.isInstanceOf[AsOfJoinExec]),
      df.queryExecution.sparkPlan.toString)
    val got = df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    // same tie rule as the column API: equal-time rights -> max value
    assert(got == Set(("a", Some(200.0)), ("b", Some(50.0)),
      ("c", Some(7.5)), ("d", None)))
  }

  test("SQL form is row-identical to the column API on the events corpus") {
    val ev = graft.Tables.load(spark, sf(), "events")
    ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("sql_errors")
    ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
      .createOrReplaceTempView("sql_purchases")
    val viaSql = spark.sql(
      """SELECT event_id, user_id, ts, p_ts AS last_purchase_ts
         FROM sql_errors ASOF JOIN sql_purchases
         ON user_id = p_uid AND ts >= p_ts""")
    // the column API wants one key name on both sides — align first
    val viaApi = AsOfJoin.lookupLastNative(
      spark.table("sql_errors"),
      spark.table("sql_purchases").withColumnRenamed("p_uid", "user_id"),
      "user_id", "ts", "p_ts", "p_ts", "last_purchase_ts")
    assert(viaSql.collect().map(_.toString).toSet ==
      viaApi.collect().map(_.toString).toSet)
  }

  test("forward ASOF JOIN (<=): earliest right at-or-after, ties to min") {
    views()
    val df = spark.sql(
      """SELECT tag, v AS got FROM sql_l ASOF JOIN sql_r
         ON k = rk AND t <= rt""")
    assert(df.queryExecution.sparkPlan.exists(_.isInstanceOf[AsOfJoinExec]))
    val got = df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    // a: t=10 -> rt=10 tie -> min v = 100; b: t=5 -> rt=10 -> 100
    // c: t=7 -> rt=7 -> 7.5; d: k=3 unmatched
    assert(got == Set(("a", Some(100.0)), ("b", Some(100.0)),
      ("c", Some(7.5)), ("d", None)))
  }

  test("ASOF LEFT JOIN spells the same (left-semantics) operator") {
    views()
    val df = spark.sql(
      """SELECT tag, v AS got FROM sql_l ASOF LEFT JOIN sql_r
         ON k = rk AND t >= rt""")
    assert(df.queryExecution.sparkPlan.exists(_.isInstanceOf[AsOfJoinExec]))
    // unmatched left rows survive with NULL — the operator's contract
    assert(df.where(col("tag") === "d").head().isNullAt(1))
  }

  test("star select and expression list both work; right columns all carried") {
    views()
    val all = spark.sql(
      """SELECT * FROM sql_l ASOF JOIN sql_r ON k = rk AND t >= rt""")
    assert(all.columns.toSeq == Seq("k", "t", "tag", "rk", "rt", "v"))
    val expr = spark.sql(
      """SELECT upper(tag) AS utag, coalesce(v, -1.0) AS v2, rt
         FROM sql_l ASOF JOIN sql_r ON k = rk AND t >= rt""")
    assert(expr.columns.toSeq == Seq("utag", "v2", "rt"))
    assert(expr.where(col("utag") === "D").head().getDouble(1) == -1.0)
  }

  test("INTERVAL JOIN ... OVERLAPS plans to IntervalJoinExec, rows equal the column API") {
    Seq((1L, 10L, 0L, 5L), (1L, 11L, 4L, 8L), (2L, 12L, 0L, 3L))
      .toDF("k", "lid", "s", "e").createOrReplaceTempView("iv_l")
    Seq((1L, 20L, 3L, 6L), (1L, 21L, 5L, 9L), (2L, 22L, 5L, 7L))
      .toDF("k2", "rid", "s2", "e2").createOrReplaceTempView("iv_r")
    val df = spark.sql(
      """SELECT lid, rid FROM iv_l INTERVAL JOIN iv_r
         ON k = k2 AND (s, e) OVERLAPS (s2, e2)""")
    assert(df.queryExecution.sparkPlan.exists(_.isInstanceOf[IntervalJoinExec]),
      df.queryExecution.sparkPlan.toString)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // half-open overlap: max(s,s2) < min(e,e2)
    assert(got == Set((10L, 20L), (11L, 20L), (11L, 21L)))
  }

  test("INTERVAL JOIN casts integral (non-long) bounds into the node's contract") {
    Seq((1, 10, 0, 5)).toDF("k", "lid", "s", "e")
      .createOrReplaceTempView("iv_il")
    Seq((1, 20, 3, 6)).toDF("k2", "rid", "s2", "e2")
      .createOrReplaceTempView("iv_ir")
    val got = spark.sql(
      """SELECT lid, rid FROM iv_il INTERVAL JOIN iv_ir
         ON k = k2 AND (s, e) OVERLAPS (s2, e2)""").collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1))).toSet == Set((10, 20)))
  }

  test("every other statement delegates to the stock parser") {
    views()
    assert(spark.sql("SELECT COUNT(*) FROM sql_l").head().getLong(0) == 4L)
    assert(spark.sql("SELECT l.tag FROM sql_l l JOIN sql_r r ON l.k = r.rk")
      .count() > 0)
  }

  test("unknown ON columns fail with a named error") {
    views()
    val e = intercept[Exception] {
      spark.sql("""SELECT * FROM sql_l ASOF JOIN sql_r
                   ON nope = rk AND t >= rt""").collect()
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("quotedMask and splitTopLevelWhere edges: doubled quotes, nested parens, keyword boundaries") {
    // SQL doubled-quote escaping: the whole literal stays masked
    assert(GraftSqlParser.rewriteTimeTravel(
      "SELECT 'it''s t VERSION AS OF 2 ok' AS s").isEmpty)
    // a WHERE glued into an identifier is not a clause boundary
    val (set1, pred1) = GraftSqlParser.splitTopLevelWhere(
      "nowhere_col = 1 WHERE k = 2")
    assert(set1 == "nowhere_col = 1" && pred1.contains("k = 2"))
    // nested subqueries: only the depth-0 WHERE splits
    val (set2, pred2) = GraftSqlParser.splitTopLevelWhere(
      "a = (SELECT x FROM u WHERE y IN (SELECT z FROM w WHERE q = 1)) WHERE k = 3")
    assert(set2 == "a = (SELECT x FROM u WHERE y IN (SELECT z FROM w WHERE q = 1))",
      set2)
    assert(pred2.contains("k = 3"))
    // no top-level WHERE at all
    assert(GraftSqlParser.splitTopLevelWhere("a = 1, b = 2") ==
      ("a = 1, b = 2", None))
    // a WHERE inside a line comment is masked
    val (set3, pred3) = GraftSqlParser.splitTopLevelWhere(
      "a = 1 -- WHERE not here\n WHERE k = 4")
    assert(pred3.contains("k = 4"), s"$set3 / $pred3")
  }

  test("splitTopLevel respects parens and quotes") {
    assert(GraftSqlParser.splitTopLevel("a, f(b, c), 'x,y', d") ==
      Seq("a", "f(b, c)", "'x,y'", "d"))
    assert(GraftSqlParser.splitTopLevel("cast(a as decimal(10, 2)), b") ==
      Seq("cast(a as decimal(10, 2))", "b"))
  }

  test("VERSION AS OF reads the pinned snapshot; two versions in one statement") {
    val root = graft.sources.Scratch.processScoped("sqlparser_tt", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((3L, "c")).toDF("k", "v"), overwrite = false)
    GraftTableRegistry.register("tt_spec", st, "t")
    assert(spark.sql("SELECT k FROM tt_spec VERSION AS OF 1")
      .as[Long].collect().toSet == Set(1L, 2L))
    // qualified references resolve through the original name
    assert(spark.sql(
      """SELECT a.k FROM tt_spec VERSION AS OF 2 a
         LEFT ANTI JOIN tt_spec VERSION AS OF 1 b ON a.k = b.k""")
      .as[Long].collect().toSet == Set(3L))
    // the pin is the resolved manifest: a commit after parse+plan
    val pinned = spark.sql("SELECT k FROM tt_spec VERSION AS OF 2")
    st.commit("t", Seq((9L, "z")).toDF("k", "v"), overwrite = true)
    assert(pinned.as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("VERSION AS OF on an unregistered name fails with the registration hint") {
    val ex = intercept[Exception](
      spark.sql("SELECT * FROM nope_not_there VERSION AS OF 1").collect())
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage)).mkString(" | ")
    assert(msgs.contains("not registered"), msgs)
  }

  test("DESCRIBE HISTORY resolves through the registry") {
    val root = graft.sources.Scratch.processScoped("sqlparser_dh", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2L, "b")).toDF("k", "v"), overwrite = false)
    GraftTableRegistry.register("dh_spec", st, "t")
    val rows = spark.sql("DESCRIBE HISTORY dh_spec")
      .select("version", "n_dirs", "overwrite")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows == Set((1L, 1L, false), (2L, 2L, false)), rows.toString)
  }

  test("statements without the clause never hit the time-travel rewrite") {
    // a column literally named `version` and strings containing the
    // words survive untouched
    Seq((1L, "x")).toDF("version", "s").createOrReplaceTempView("tt_plain")
    assert(spark.sql("SELECT version FROM tt_plain").as[Long].collect()
      .toSet == Set(1L))
  }

  test("OPTIMIZE and VACUUM statements run through the registry") {
    val root = graft.sources.Scratch.processScoped("sqlparser_opt", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "a")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((2L, "b")).toDF("k", "v"), overwrite = false)
    GraftTableRegistry.register("opt_spec", st, "t")
    val r = spark.sql("OPTIMIZE opt_spec").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("opt_spec", 3L)))
    assert(st.manifestDirs("t").size == 1, "compacted to one dir")
    val vac = spark.sql("VACUUM opt_spec RETAIN 1 VERSIONS").collect()
    assert(vac.head.getLong(1) >= 2L, vac.mkString) // both old dirs GC'd
    assert(st.versions("t") == Seq(3L))
    assert(st.read("t").select("k").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("OPTIMIZE ... CLUSTER BY reclusters along the Hilbert curve") {
    val root = graft.sources.Scratch.processScoped("sqlparser_optc", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    val grid = (0 until 1024).map(i => (i.toLong % 32, i.toLong / 32, i))
      .toDF("x", "y", "payload")
    st.commit("t", grid.repartition(4), overwrite = true)
    GraftTableRegistry.register("optc_spec", st, "t")
    val r = spark.sql("OPTIMIZE optc_spec CLUSTER BY (x, y)").head()
    assert(r.getLong(1) == 2L)
    // the clustered layout prunes a box query (cluster cols recorded
    // as stats by the command itself)
    val preds = Seq(("x", "0", "3"), ("y", "0", "3"))
    val (_, skipped) = st.pruneDirsBox("t", preds)
    assert(skipped.nonEmpty, "CLUSTER BY must produce a prunable layout")
    assert(st.read("t").count() == 1024L)
  }

  test("RESTORE TABLE ... TO VERSION AS OF republishes the old snapshot") {
    val root = graft.sources.Scratch.processScoped("sqlparser_rst", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), overwrite = true)
    st.commit("t", Seq((9L, "z")).toDF("k", "v"), overwrite = true)
    GraftTableRegistry.register("rst_spec", st, "t")
    val r = spark.sql("RESTORE TABLE rst_spec TO VERSION AS OF 1").head()
    assert((r.getString(0), r.getLong(1), r.getLong(2)) == ("rst_spec", 1L, 3L))
    assert(st.read("t").select("k").as[Long].collect().toSet == Set(1L, 2L))
    // the bad version is still time-travelable (restore is a publish,
    // not a rollback-by-deletion), and the TABLE-less spelling parses
    assert(st.read("t", Some(2L)).select("k").as[Long].collect()
      .toSet == Set(9L))
    spark.sql("RESTORE rst_spec TO VERSION AS OF 2")
    assert(st.read("t").select("k").as[Long].collect().toSet == Set(9L))
  }

  test("DELETE FROM ... WHERE runs a deletion-vector delete; unregistered names delegate") {
    val root = graft.sources.Scratch.processScoped("sqlparser_del", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", (0L until 100L).map(k => (k, k * 2)).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k"))
    val dirs = st.manifestDirs("t").toSet
    GraftTableRegistry.register("del_spec", st, "t", keyCol = "k")
    val r = spark.sql("DELETE FROM del_spec WHERE k % 10 = 0 AND k < 50").head()
    assert((r.getString(0), r.getLong(1)) == ("del_spec", 2L))
    // zero rewrite: same data dirs plus one vector
    assert(st.manifestDirs("t").toSet == dirs)
    assert(st.manifestDels("t", 2L).size == 1)
    assert(st.read("t").count() == 95)
    assert(st.read("t").where(col("k") === 20L).isEmpty)
    // a key-less registration fails with the registration hint
    GraftTableRegistry.register("del_nokey", st, "t")
    val ex = intercept[Exception](
      spark.sql("DELETE FROM del_nokey WHERE k = 1").collect())
    assert(ex.getMessage.contains("key"), ex.getMessage)
    // DELETE against an unregistered name reaches the stock parser
    // (which rejects it as an unresolved table, not our command)
    val ex2 = intercept[Exception](
      spark.sql("DELETE FROM not_registered_at_all WHERE x = 1").collect())
    assert(!String.valueOf(ex2.getMessage).contains("not registered"))
  }

  test("INSERT INTO and UPDATE statements run as store commits") {
    val root = graft.sources.Scratch.processScoped("sqlparser_dml", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, 10.0), (2L, 20.0)).toDF("k", "p"),
      overwrite = true, statsCols = Seq("k"))
    GraftTableRegistry.register("dml_spec", st, "t", keyCol = "k")
    // INSERT: VALUES form + a SELECT form that itself uses the
    // registered surface (VERSION AS OF)
    val ins = spark.sql("INSERT INTO dml_spec VALUES (3L, 30.0)").head()
    assert((ins.getLong(1), ins.getLong(2)) == (2L, 1L))
    spark.sql(
      "INSERT INTO dml_spec SELECT k + 100, p FROM dml_spec VERSION AS OF 1")
    assert(st.read("t").count() == 5)
    // UPDATE: copy-on-write merge, one atomic commit, count back
    val up = spark.sql(
      "UPDATE dml_spec SET p = p * 2 WHERE k IN (1, 101)").head()
    assert(up.getLong(2) == 2L, up.toString)
    val got = st.read("t").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 20.0, 2L -> 20.0, 3L -> 30.0,
      101L -> 20.0, 102L -> 20.0), got.toString)
    // assigning the key refuses; zero-match UPDATE moves nothing
    intercept[Exception](
      spark.sql("UPDATE dml_spec SET k = k + 1 WHERE p = 20.0").collect())
    val v = st.versions("t").max
    assert(spark.sql("UPDATE dml_spec SET p = 0.0 WHERE k = 999")
      .head().getLong(2) == 0L)
    assert(st.versions("t").max == v)
    // WHERE-less UPDATE touches every row
    val all = spark.sql("UPDATE dml_spec SET p = 1.0").head()
    assert(all.getLong(2) == 5L, all.toString)
    assert(st.read("t").select("p").as[Double].collect().forall(_ == 1.0))
    // DML against unregistered names still reaches the stock parser
    Seq((1L, 1.0)).toDF("k", "p").createOrReplaceTempView("dml_plain")
    intercept[Exception](
      spark.sql("INSERT INTO dml_plain VALUES (2L, 2.0)").collect())
  }

  test("review fixes: simultaneous SET, WHERE in literals/subqueries, unmatched tombstones, stale keys") {
    val root = graft.sources.Scratch.processScoped("sqlparser_fix", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, 10.0, 100.0)).toDF("k", "a", "b"),
      overwrite = true, statsCols = Seq("k"))
    GraftTableRegistry.register("fix_spec", st, "t", keyCol = "k")
    // simultaneous assignment: SET a = b, b = a SWAPS
    spark.sql("UPDATE fix_spec SET a = b, b = a WHERE k = 1").collect()
    val r = st.read("t").head()
    assert((r.getDouble(1), r.getDouble(2)) == (100.0, 10.0), r.toString)
    // a WHERE inside a parenthesized subquery / string literal in the
    // SET list does not split the statement
    Seq((1L, 7.0)).toDF("k", "x").createOrReplaceTempView("fix_src")
    spark.sql("""UPDATE fix_spec
      SET a = (SELECT max(x) FROM fix_src WHERE x > 0) WHERE k = 1""").collect()
    assert(st.read("t").head().getDouble(1) == 7.0)
    // MERGE: an UNMATCHED del-flagged source row still INSERTS (the
    // SQL contract — the matched-delete clause scopes to matches)
    Seq((1L, 0.0, 0.0, true), (9L, 9.0, 9.0, true))
      .toDF("k", "a", "b", "del").createOrReplaceTempView("fix_msrc")
    spark.sql("""MERGE INTO fix_spec AS t USING fix_msrc AS s ON t.k = s.k
      WHEN MATCHED AND del THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").collect()
    assert(st.read("t").select("k").as[Long].collect().toSet == Set(9L),
      "matched del drops; UNMATCHED del inserts")
    // re-registering WITHOUT a key clears the stale key binding
    GraftTableRegistry.register("fix_spec", st, "t")
    val ex = intercept[Exception](
      spark.sql("DELETE FROM fix_spec WHERE k = 9").collect())
    assert(ex.getMessage.contains("key"), ex.getMessage)
    // VACUUM RETAIN 0 refuses instead of wiping the table
    GraftTableRegistry.register("fix_spec", st, "t", keyCol = "k")
    val ex2 = intercept[Exception](
      spark.sql("VACUUM fix_spec RETAIN 0 VERSIONS").collect())
    assert(ex2.getMessage.contains("retain"), ex2.getMessage)
    // unregistered OPTIMIZE/VACUUM fall through to the delegate
    val ex3 = intercept[Exception](
      spark.sql("OPTIMIZE not_ours_at_all").collect())
    assert(!String.valueOf(ex3.getMessage).contains("not registered"),
      ex3.getMessage)
    // backslash-escaped quote inside a literal does not end the quote
    // region for the time-travel rewrite
    assert(GraftSqlParser.rewriteTimeTravel(
      "SELECT 'a\\' x VERSION AS OF 3' AS s").isEmpty)
  }

  test("MERGE INTO upsert-all shape runs the store's keyed merge") {
    val root = graft.sources.Scratch.processScoped("sqlparser_mrg", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, 10.0), (2L, 20.0)).toDF("k", "p"),
      overwrite = true, statsCols = Seq("k"))
    GraftTableRegistry.register("mrg_spec", st, "t", keyCol = "k")
    Seq((2L, 25.0, false), (3L, 30.0, false), (1L, 0.0, true))
      .toDF("k", "p", "del").createOrReplaceTempView("mrg_src")
    val r = spark.sql(
      """MERGE INTO mrg_spec AS t USING mrg_src AS s ON t.k = s.k
         WHEN MATCHED AND del THEN DELETE
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").head()
    assert((r.getString(0), r.getLong(1)) == ("mrg_spec", 2L))
    assert(st.read("t").as[(Long, Double)].collect().toMap ==
      Map(2L -> 25.0, 3L -> 30.0)) // 1 tombstoned, 2 updated, 3 inserted
    // ON must equate the registered key
    val ex = intercept[Exception](spark.sql(
      """MERGE INTO mrg_spec AS t USING mrg_src AS s ON t.p = s.p
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").collect())
    assert(ex.getMessage.contains("registered key"), ex.getMessage)
  }

  test("round-14 hardening: nested comments, identifier WHERE boundary, ANSI INSERT, MERGE cardinality") {
    // nested bracketed comments (Spark SQL nests them) stay masked to
    // the OUTERMOST close — the inner */ must not unmask the tail
    assert(GraftSqlParser.rewriteTimeTravel(
      "SELECT /* a /* b */ t VERSION AS OF 3 */ k FROM t").isEmpty)
    // '_' and '$' continue an identifier: SET columns containing a
    // 'where' fragment never split the statement
    assert(GraftSqlParser.splitTopLevelWhere("where_updated = 1 WHERE k = 2") ==
      ("where_updated = 1", Some("k = 2")))
    assert(GraftSqlParser.splitTopLevelWhere("a = x_where") ==
      ("a = x_where", None))
    assert(GraftSqlParser.splitTopLevelWhere("a = where$t") ==
      ("a = where$t", None))
    val root = graft.sources.Scratch.processScoped("sqlparser_r14", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, 0, 10.0), (2L, 0, 20.0))
      .toDF("k", "where_updated", "p"),
      overwrite = true, statsCols = Seq("k"))
    GraftTableRegistry.register("r14_spec", st, "t", keyCol = "k")
    // end to end: the underscore-adjacent 'where' is a SET column
    val up = spark.sql(
      "UPDATE r14_spec SET where_updated = 1 WHERE k = 2").head()
    assert(up.getLong(2) == 1L, up.toString)
    assert(st.read("t").agg(sum(col("where_updated"))).head().getLong(0) == 1L)
    // ANSI-strict INSERT: an incompatible value fails the write job
    // loudly (naming column and value) and nothing publishes
    val before = st.versions("t").max
    val ex = intercept[Exception](
      spark.sql("INSERT INTO r14_spec VALUES (9L, 'nope', 1.0)").collect())
    val msg = ex.getMessage +
      Iterator.iterate(ex.getCause)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString
    // ANSI-on sessions (the Spark 4 default) fail inside the cast
    // itself; the raise_error guard covers ANSI-off sessions — either
    // way the failure is loud and names the value
    assert(msg.contains("nope") &&
      (msg.contains("not a valid") || msg.contains("CAST_INVALID_INPUT")), msg)
    assert(st.versions("t").max == before, "a failed INSERT must not publish")
    // with ANSI off (where default casts silently NULL) the
    // raise_error guard is what fails the job
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ex1b = intercept[Exception](
        spark.sql("INSERT INTO r14_spec VALUES (9L, 'nope', 1.0)").collect())
      val msg1b = ex1b.getMessage +
        Iterator.iterate(ex1b.getCause)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString
      assert(msg1b.contains("not a valid") && msg1b.contains("nope"), msg1b)
      assert(st.versions("t").max == before)
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    // a legal widening cast still lands
    spark.sql("INSERT INTO r14_spec VALUES (9, 1, 1.0)")
    assert(st.read("t").count() == 3L)
    // MERGE refuses duplicate source keys (silent duplicate-key
    // corruption otherwise) and names the offending key...
    Seq((2L, 1, 1.0), (2L, 1, 2.0), (5L, 0, 5.0))
      .toDF("k", "where_updated", "p").createOrReplaceTempView("r14_dup")
    val ex2 = intercept[Exception](spark.sql(
      """MERGE INTO r14_spec AS t USING r14_dup AS s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").collect())
    assert(ex2.getMessage.contains("at most one source row") &&
      ex2.getMessage.contains("`2`"), ex2.getMessage)
    // ...and the documented dedup workaround passes
    spark.sql("""CREATE OR REPLACE TEMP VIEW r14_dedup AS
      SELECT k, where_updated, p FROM (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY p DESC) rn
        FROM r14_dup) WHERE rn = 1""")
    spark.sql(
      """MERGE INTO r14_spec AS t USING r14_dedup AS s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").collect()
    val got = st.read("t").select(col("k"), col("p")).as[(Long, Double)]
      .collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 2.0, 5L -> 5.0, 9L -> 1.0),
      got.toString)
  }

  test("column-level MERGE: SET c = expr, INSERT (cols) VALUES, single-clause scoping") {
    val root = graft.sources.Scratch.processScoped("sqlparser_mrgc", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "tag", "p"),
      overwrite = true, statsCols = Seq("k"))
    GraftTableRegistry.register("mrgc_spec", st, "t", keyCol = "k")
    Seq((2L, 5.0), (3L, 7.0)).toDF("k", "bonus")
      .createOrReplaceTempView("mrgc_src")
    // both clauses: SET references BOTH sides; INSERT projects with a
    // literal and leaves no column unnamed
    spark.sql("""MERGE INTO mrgc_spec AS t USING mrgc_src AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET p = t.p + s.bonus
      WHEN NOT MATCHED THEN INSERT (k, tag, p) VALUES (s.k, 'new', s.bonus)""")
    def rows() = st.read("t").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"),
        r.getDouble(2))).toSet
    assert(rows() == Set((1L, "a", 10.0), (2L, "b", 25.0), (3L, "new", 7.0)),
      rows().toString)
    // update-only: an unmatched source row must NOT insert
    Seq((3L, 1.0), (9L, 9.0)).toDF("k", "bonus")
      .createOrReplaceTempView("mrgc_src2")
    spark.sql("""MERGE INTO mrgc_spec AS t USING mrgc_src2 AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET p = t.p + s.bonus""")
    assert(rows() == Set((1L, "a", 10.0), (2L, "b", 25.0), (3L, "new", 8.0)),
      rows().toString)
    // insert-only: a matched source row must leave the target row alone;
    // unnamed columns land NULL
    Seq((3L, 100.0), (4L, 4.0)).toDF("k", "bonus")
      .createOrReplaceTempView("mrgc_src3")
    spark.sql("""MERGE INTO mrgc_spec AS t USING mrgc_src3 AS s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, s.bonus)""")
    assert(rows() == Set((1L, "a", 10.0), (2L, "b", 25.0), (3L, "new", 8.0),
      (4L, "-", 4.0)), rows().toString)
    // guard rails: key reassignment, unknown column, INSERT without the
    // key, duplicate source keys
    val ex1 = intercept[Exception](spark.sql(
      """MERGE INTO mrgc_spec AS t USING mrgc_src AS s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET k = s.k + 1""").collect())
    assert(ex1.getMessage.contains("reassign the key"), ex1.getMessage)
    val ex2 = intercept[Exception](spark.sql(
      """MERGE INTO mrgc_spec AS t USING mrgc_src AS s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET nosuch = 1""").collect())
    assert(ex2.getMessage.contains("not a target column"), ex2.getMessage)
    val ex3 = intercept[Exception](spark.sql(
      """MERGE INTO mrgc_spec AS t USING mrgc_src AS s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (p) VALUES (s.bonus)""").collect())
    assert(ex3.getMessage.contains("must include the key"), ex3.getMessage)
    Seq((7L, 1.0), (7L, 2.0)).toDF("k", "bonus")
      .createOrReplaceTempView("mrgc_dup")
    val ex4 = intercept[Exception](spark.sql(
      """MERGE INTO mrgc_spec AS t USING mrgc_dup AS s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET p = s.bonus""").collect())
    assert(ex4.getMessage.contains("at most one source row"), ex4.getMessage)
  }

  test("CREATE TABLE / CTAS / DROP TABLE: the pure-SQL table origin") {
    val root = graft.sources.Scratch.processScoped("sqlparser_ddl", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "ddl_t"))
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "ddl_c"))
    GraftTableRegistry.unregister("ddl_t")
    GraftTableRegistry.unregister("ddl_c")
    // schema form: an EMPTY v1 whose schema is durable on disk
    val r = spark.sql("CREATE TABLE ddl_t (k BIGINT, v STRING) " +
      s"USING graft PRIMARY KEY k LOCATION '$root'").head()
    assert((r.getString(0), r.getLong(1)) == ("ddl_t", 1L))
    val empty = spark.sql("SELECT * FROM ddl_t VERSION AS OF 1")
    assert(empty.schema.map(_.name) == Seq("k", "v"))
    assert(empty.count() == 0L)
    // the FULL DML lifecycle over the SQL-born table, zero Scala setup
    spark.sql("INSERT INTO ddl_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("UPDATE ddl_t SET v = 'z' WHERE k = 2")
    spark.sql("DELETE FROM ddl_t WHERE k = 1")
    assert(spark.sql("SELECT k, v FROM ddl_t VERSION AS OF 4").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet == Set((2L, "z")))
    // bare CREATE of a registered name refuses; IF NOT EXISTS adopts
    intercept[Exception](spark.sql(
      s"CREATE TABLE ddl_t (k BIGINT) USING graft LOCATION '$root'").collect())
    assert(spark.sql("CREATE TABLE IF NOT EXISTS ddl_t (k BIGINT, v STRING) " +
      s"USING graft LOCATION '$root'").head().getLong(1) == 4L)
    // CTAS seeds v1 from a session query (here: a time-travel read)
    val c = spark.sql(s"CREATE TABLE ddl_c USING graft PRIMARY KEY k " +
      s"LOCATION '$root' AS SELECT k, v FROM ddl_t VERSION AS OF 4").head()
    assert((c.getString(0), c.getLong(1)) == ("ddl_c", 1L))
    // DROP unbinds the name (data stays on disk)...
    spark.sql("DROP TABLE ddl_c")
    intercept[Exception](
      spark.sql("DELETE FROM ddl_c WHERE k = 2").collect())
    // ...and a later CREATE IF NOT EXISTS re-adopts the on-disk view
    assert(spark.sql("CREATE TABLE IF NOT EXISTS ddl_c (k BIGINT, v STRING) " +
      s"USING graft PRIMARY KEY k LOCATION '$root'").head().getLong(1) == 1L)
    assert(spark.sql("SELECT * FROM ddl_c VERSION AS OF 1").count() == 1L)
    // adoption must not silently contradict the statement: conflicting
    // LOCATION / PRIMARY KEY refuse instead of rebinding or no-op'ing
    val exL = intercept[Exception](spark.sql(
      "CREATE TABLE IF NOT EXISTS ddl_c (k BIGINT) USING graft " +
        "PRIMARY KEY k LOCATION '/tmp/entirely_different_root'").collect())
    assert(exL.getMessage.contains("conflicts with the registered root"),
      exL.getMessage)
    val exK = intercept[Exception](spark.sql(
      "CREATE TABLE IF NOT EXISTS ddl_c (k BIGINT, v STRING) USING graft " +
        s"PRIMARY KEY v LOCATION '$root'").collect())
    assert(exK.getMessage.contains("conflicts with the registered key"),
      exK.getMessage)
    // on-disk adoption validates the declared key against the REAL
    // schema of the adopted view, not the statement's column list
    GraftTableRegistry.unregister("ddl_c")
    val exA = intercept[Exception](spark.sql(
      "CREATE TABLE IF NOT EXISTS ddl_c (k BIGINT, nope BIGINT) " +
        s"USING graft PRIMARY KEY nope LOCATION '$root'").collect())
    assert(exA.getMessage.contains("not a column of the adopted view"),
      exA.getMessage)
    // guard rails: no root anywhere, and a PRIMARY KEY that is not a column
    GraftTableRegistry.unregister("ddl_miss")
    val ex = intercept[Exception](spark.sql(
      "CREATE TABLE ddl_miss (k BIGINT) USING graft").collect())
    assert(ex.getMessage.contains("spark.graft.store.root"), ex.getMessage)
    val ex2 = intercept[Exception](spark.sql(
      s"CREATE TABLE ddl_miss (k BIGINT) USING graft PRIMARY KEY nope " +
        s"LOCATION '$root'").collect())
    assert(ex2.getMessage.contains("PRIMARY KEY"), ex2.getMessage)
    // non-graft CREATE/DROP statements are never claimed
    assert(GraftSqlParser.parseMaintenance(
      "CREATE TABLE x (k INT) USING parquet").isEmpty)
    assert(GraftSqlParser.parseMaintenance(
      "DROP TABLE some_unregistered_name").isEmpty)
  }

  test("ALTER TABLE ADD COLUMNS, TRUNCATE TABLE, DESCRIBE DETAIL") {
    val root = graft.sources.Scratch.processScoped("sqlparser_ddl2", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, 10.0)).toDF("k", "p"),
      overwrite = true, statsCols = Seq("k"))
    GraftTableRegistry.register("ddl2_spec", st, "t", keyCol = "k")
    // ALTER widens the merged schema; existing rows surface NULL
    val a = spark.sql("ALTER TABLE ddl2_spec ADD COLUMN note STRING").head()
    assert((a.getString(0), a.getLong(1)) == ("ddl2_spec", 2L))
    assert(st.read("t").schema.map(_.name) == Seq("k", "p", "note"))
    assert(st.read("t").where(col("note").isNull).count() == 1L)
    // new rows carry it; re-adding an existing column refuses
    spark.sql("INSERT INTO ddl2_spec VALUES (2L, 20.0, 'hi')")
    assert(st.read("t").where(col("note") === "hi").count() == 1L)
    val ex = intercept[Exception](
      spark.sql("ALTER TABLE ddl2_spec ADD COLUMN p DOUBLE").collect())
    assert(ex.getMessage.contains("already exists"), ex.getMessage)
    // multi-column parenthesized form
    spark.sql("ALTER TABLE ddl2_spec ADD COLUMNS (m INT, q DOUBLE)")
    assert(st.read("t").schema.map(_.name) == Seq("k", "p", "note", "m", "q"))
    // DESCRIBE DETAIL: one metadata row, zero jobs needed
    val d = spark.sql("DESCRIBE DETAIL ddl2_spec").head()
    assert(d.getString(0) == "ddl2_spec")
    assert(d.getLong(1) == st.versions("t").max)
    assert(d.getLong(2) == st.manifestDirs("t").size.toLong)
    assert(d.getLong(3) == 0L)
    assert(d.getLong(4) > 0L)
    assert(d.getString(5) == "k")
    // TRUNCATE: contents go, history and fences stay, still writable
    st.appendOnce("t", Seq((3L, 1.0, "z", 1, 1.0))
      .toDF("k", "p", "note", "m", "q"), txnId = 7L)
    val tv = spark.sql("TRUNCATE TABLE ddl2_spec").head().getLong(1)
    assert(st.read("t").count() == 0L)
    assert(st.read("t", Some(tv - 1)).count() == 3L)
    assert(st.appliedTxns("t").contains(7L),
      "txn fences must survive TRUNCATE")
    spark.sql("INSERT INTO ddl2_spec VALUES (5L, 1.0, 'x', 1, 1.0)")
    assert(st.read("t").count() == 1L)
    // parameterized types: the type's own parens must survive the
    // optional-wrapper unwrapping (both forms)
    spark.sql("ALTER TABLE ddl2_spec ADD COLUMN d DECIMAL(10,2)")
    assert(st.read("t").schema("d").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    spark.sql("ALTER TABLE ddl2_spec ADD COLUMNS (e DECIMAL(5,1))")
    assert(st.read("t").schema("e").dataType ==
      org.apache.spark.sql.types.DecimalType(5, 1))
    assert(GraftSqlParser.stripOuterParens("a INT, b STRING") ==
      "a INT, b STRING")
    assert(GraftSqlParser.stripOuterParens("(a INT, b STRING)") ==
      "a INT, b STRING")
    assert(GraftSqlParser.stripOuterParens("d DECIMAL(10,2)") ==
      "d DECIMAL(10,2)")
    assert(GraftSqlParser.stripOuterParens("(d DECIMAL(10,2), e INT)") ==
      "d DECIMAL(10,2), e INT")
    // ANALYZE TABLE: Spark's spelling over the registered view — the
    // ALL COLUMNS form profiles everything, unknown columns refuse
    val prof = spark.sql(
      "ANALYZE TABLE ddl2_spec COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof.keySet == st.read("t").columns.toSet, prof.toString)
    assert(prof.values.forall(_ == 1L), prof.toString) // 1 row post-truncate+insert
    val exAn = intercept[Exception](spark.sql(
      "ANALYZE TABLE ddl2_spec COMPUTE STATISTICS FOR COLUMNS nosuch").collect())
    assert(exAn.getMessage.contains("not a table column"), exAn.getMessage)
    // none of the four is claimed for unregistered names
    assert(GraftSqlParser.parseMaintenance(
      "ALTER TABLE not_ours ADD COLUMN x INT").isEmpty)
    assert(GraftSqlParser.parseMaintenance(
      "TRUNCATE TABLE not_ours").isEmpty)
    assert(GraftSqlParser.parseMaintenance(
      "DESCRIBE DETAIL not_ours").isEmpty)
    assert(GraftSqlParser.parseMaintenance(
      "ANALYZE TABLE not_ours COMPUTE STATISTICS FOR ALL COLUMNS").isEmpty)
  }

  test("VACUUM DRY RUN and SHOW GRAFT TABLES") {
    val root = graft.sources.Scratch.processScoped("sqlparser_vdr", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, "a")).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k"))
    st.commit("t", Seq((2L, "b")).toDF("k", "v"),
      overwrite = true, statsCols = Seq("k")) // v1's dir is now dead
    GraftTableRegistry.register("vdr_spec", st, "t", keyCol = "k")
    // dry run names the removable dirs AND expiring versions, deletes
    // NOTHING
    val dry = spark.sql("VACUUM vdr_spec RETAIN 1 VERSIONS DRY RUN").collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(dry == Set(
      ("data_dir", st.manifestDirs("t", Some(1L)).head),
      ("version", "v1")), dry.toString)
    assert(st.versions("t") == Seq(1L, 2L), "dry run must not GC")
    assert(st.read("t", Some(1L)).count() == 1L)
    // append-only shape: no dir dies, but the dry run still surfaces
    // the manifest (time-travel) loss
    st.commit("t", Seq((3L, "c")).toDF("k", "v"), overwrite = false,
      statsCols = Seq("k"))
    val dry2 = spark.sql("VACUUM vdr_spec RETAIN 1 VERSIONS DRY RUN")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(dry2.contains(("version", "v2")), dry2.toString)
    val live3 = st.manifestDirs("t", Some(3L)).toSet
    assert(dry2.collect { case ("data_dir", d) => d }
      .forall(!live3.contains(_)), dry2.toString)
    // the real vacuum then removes exactly what the dry run named:
    // v1's dir (v2's is carried live in v3), versions v1 and v2
    val removed = spark.sql("VACUUM vdr_spec RETAIN 1 VERSIONS").head()
    assert(removed.getLong(1) == 1L)
    assert(st.versions("t") == Seq(3L))
    // the registry listing carries the binding and its version
    val shown = spark.sql("SHOW GRAFT TABLES").collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getString(3),
        r.getLong(4))).toMap
    assert(shown("vdr_spec") == (("t", "k", 3L)), shown.toString)
    assert(shown.contains("vdr_spec"))
    // registered-but-never-committed views describe (and list) as v0
    // instead of crashing on an empty version chain
    GraftTableRegistry.register("vdr_empty", st, "never_committed", "k")
    val d0 = spark.sql("DESCRIBE DETAIL vdr_empty").head()
    assert((d0.getLong(1), d0.getLong(2), d0.getLong(4)) == ((0L, 0L, 0L)),
      d0.toString)
    assert(spark.sql("SHOW GRAFT TABLES").collect()
      .find(_.getString(0) == "vdr_empty").get.getLong(4) == 0L)
    GraftTableRegistry.unregister("vdr_empty")
  }

  test("CHANGES FROM ... TO: the change data feed as a SQL relation") {
    // rewrite fires only on the real clause shape, outside quotes
    assert(GraftSqlParser.rewriteChanges(
      "SELECT * FROM t CHANGES FROM 1 TO 4")
      .contains("SELECT * FROM `t$diff$1$4`"))
    assert(GraftSqlParser.rewriteChanges(
      "SELECT 't CHANGES FROM 1 TO 4' AS s").isEmpty)
    assert(GraftSqlParser.rewriteChanges("SELECT changes FROM t").isEmpty)
    val root = graft.sources.Scratch.processScoped("sqlparser_chg", "spec")
    graft.sources.Scratch.deleteRecursively(new java.io.File(root, "t"))
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1L, 10.0), (2L, 20.0)).toDF("k", "p"),
      overwrite = true, statsCols = Seq("k"))
    st.mergeInto("t", Seq((2L, 25.0), (3L, 30.0)).toDF("k", "p"), "k",
      statsCols = Seq("k"))
    GraftTableRegistry.register("chg_spec", st, "t", keyCol = "k")
    val rows = spark.sql(
      "SELECT change_type, k FROM chg_spec CHANGES FROM 1 TO 2").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("update", 2L), ("insert", 3L)), rows.toString)
    // composes: the diff relation joins like any other
    val joined = spark.sql(
      """SELECT c.change_type, v.p FROM chg_spec CHANGES FROM 1 TO 2 AS c
         JOIN chg_spec VERSION AS OF 2 AS v ON c.k = v.k""").count()
    assert(joined == 2L)
    // a key-less registration fails with the 4-arg hint
    GraftTableRegistry.register("chg_nokey", st, "t")
    val ex = intercept[Exception](spark.sql(
      "SELECT * FROM chg_nokey CHANGES FROM 1 TO 2").collect())
    assert(ex.getMessage.contains("key"), ex.getMessage)
  }

  test("VERSION AS OF inside string literals and comments is left verbatim") {
    // pure literal: no rewrite fires at all
    assert(GraftSqlParser.rewriteTimeTravel(
      "SELECT 'orders VERSION AS OF 3' AS note").isEmpty)
    assert(GraftSqlParser.rewriteTimeTravel(
      "SELECT k -- orders VERSION AS OF 3\nFROM t").isEmpty)
    assert(GraftSqlParser.rewriteTimeTravel(
      "SELECT /* t VERSION AS OF 9 */ k FROM t").isEmpty)
    // mixed: only the quote-depth-0 occurrence rewrites
    val mixed = GraftSqlParser.rewriteTimeTravel(
      "SELECT 'x VERSION AS OF 7' AS s, k FROM tt_spec VERSION AS OF 1")
    assert(mixed.contains(
      "SELECT 'x VERSION AS OF 7' AS s, k FROM `tt_spec$asof$1`"), mixed)
    // end to end: the literal survives execution byte-identical
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("tt_lit")
    assert(spark.sql("SELECT 'orders VERSION AS OF 3' AS note FROM tt_lit")
      .head().getString(0) == "orders VERSION AS OF 3")
  }
}
