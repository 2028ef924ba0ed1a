package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The general multi-clause conditional MERGE (SQL:2003 / Delta
  * semantics): first-match-wins clause precedence, conditional
  * matched DELETE in clause position, conditional NOT MATCHED inserts,
  * and no-clause rows left untouched.
  */
class MergeWhenSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (graft.sources.SnapshotStore, String) = {
    n += 1
    val root = graft.sources.Scratch.processScoped("mergewhen_spec", "spec") +
      s"/case$n"
    val name = s"mw$n"
    val st = new graft.sources.SnapshotStore(spark, root)
    st.commit("t", Seq((1, 10.0, "a"), (2, 20.0, "a"), (3, 30.0, "a"),
      (4, 40.0, "a")).toDF("k", "p", "seg"), overwrite = true,
      statsCols = Seq("k"))
    GraftTableRegistry.register(name, st, "t", keyCol = "k")
    (st, name)
  }

  test("clause precedence: a row matching two clauses takes the FIRST") {
    val (st, name) = fresh()
    // k=1 (p=10) fires BOTH conditions; first-match-wins must apply
    // the first clause's update, not the second's
    Seq((1, 5.0), (2, 5.0)).toDF("k", "bonus")
      .createOrReplaceTempView("mw_src1")
    spark.sql(
      s"""MERGE INTO $name AS t USING mw_src1 AS s ON t.k = s.k
          WHEN MATCHED AND t.p < 15 THEN UPDATE SET p = t.p + 100
          WHEN MATCHED AND t.p < 25 THEN UPDATE SET p = t.p + 1000
          WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, s.bonus)""")
    val m = st.read("t").select("k", "p").as[(Int, Double)].collect().toMap
    assert(m(1) == 110.0, s"k=1 must take the FIRST clause: ${m(1)}")
    assert(m(2) == 1020.0, s"k=2 falls to the second clause: ${m(2)}")
    assert(m(3) == 30.0 && m(4) == 40.0, "unmatched target rows untouched")
  }

  test("conditional matched DELETE, fall-through update, conditional insert") {
    val (st, name) = fresh()
    Seq((1, 99.0), (3, 5.0), (7, 70.0), (8, 1.0)).toDF("k", "np")
      .createOrReplaceTempView("mw_src2")
    spark.sql(
      s"""MERGE INTO $name AS t USING mw_src2 AS s ON t.k = s.k
          WHEN MATCHED AND s.np > 50 THEN DELETE
          WHEN MATCHED THEN UPDATE SET p = s.np, seg = 'upd'
          WHEN NOT MATCHED AND s.np >= 10 THEN INSERT (k, p, seg)
            VALUES (s.k, s.np, 'new')""")
    val m = st.read("t").collect().map(r =>
      r.getInt(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(!m.contains(1), "k=1 matched the DELETE clause")
    assert(m(3) == ((5.0, "upd")), "k=3 fell through to the UPDATE clause")
    assert(m(7) == ((70.0, "new")), "k=7 inserted (condition holds)")
    assert(!m.contains(8), "k=8 fails the insert condition — dropped")
    assert(m(2) == ((20.0, "a")) && m(4) == ((40.0, "a")), "untouched rows")
  }

  test("matched rows firing NO clause stay untouched (filtered from the source)") {
    val (st, name) = fresh()
    Seq((2, 0.0), (9, 90.0)).toDF("k", "np").createOrReplaceTempView("mw_src3")
    spark.sql(
      s"""MERGE INTO $name AS t USING mw_src3 AS s ON t.k = s.k
          WHEN MATCHED AND s.np > 10 THEN UPDATE SET p = s.np
          WHEN NOT MATCHED THEN INSERT (k, p, seg) VALUES (s.k, s.np, 'i')""")
    val m = st.read("t").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(2) == 20.0, "k=2 matched but fired no clause — untouched")
    assert(m(9) == 90.0, "k=9 inserted")
  }

  test("UPDATE SET * / INSERT * clauses work in the general form with conditions") {
    val (st, name) = fresh()
    Seq((1, 111.0, "s"), (9, 999.0, "s")).toDF("k", "p", "seg")
      .createOrReplaceTempView("mw_src4")
    spark.sql(
      s"""MERGE INTO $name AS t USING mw_src4 AS s ON t.k = s.k
          WHEN MATCHED AND s.p > 100 THEN UPDATE SET *
          WHEN NOT MATCHED AND s.p < 10000 THEN INSERT *""")
    val m = st.read("t").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(1) == 111.0 && m(9) == 999.0)
  }

  test("grammar refusals: INSERT under MATCHED, duplicate source keys, key reassignment") {
    val (_, name) = fresh()
    Seq((1, 1.0)).toDF("k", "np").createOrReplaceTempView("mw_src5")
    val e1 = intercept[Exception](spark.sql(
      s"""MERGE INTO $name AS t USING mw_src5 AS s ON t.k = s.k
          WHEN MATCHED THEN INSERT (k, p) VALUES (s.k, s.np)"""))
    assert(e1.getMessage.contains("INSERT needs WHEN NOT MATCHED"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO $name AS t USING mw_src5 AS s ON t.k = s.k
          WHEN MATCHED AND t.p > 0 THEN UPDATE SET k = s.k + 1"""))
    assert(e2.getMessage.contains("cannot reassign the key"), e2.getMessage)
    Seq((1, 1.0), (1, 2.0)).toDF("k", "np").createOrReplaceTempView("mw_dup")
    val e3 = intercept[Exception](spark.sql(
      s"""MERGE INTO $name AS t USING mw_dup AS s ON t.k = s.k
          WHEN MATCHED AND s.np > 0 THEN UPDATE SET p = s.np"""))
    assert(e3.getMessage.contains("at most one source row"), e3.getMessage)
    // a NOT MATCHED condition referencing the target would silently
    // evaluate NULL -> false and drop every insert — refuse loudly
    val e4 = intercept[Exception](spark.sql(
      s"""MERGE INTO $name AS t USING mw_src5 AS s ON t.k = s.k
          WHEN NOT MATCHED AND t.p > 0 THEN INSERT (k, p) VALUES (s.k, s.np)"""))
    assert(e4.getMessage.contains("cannot reference the target"), e4.getMessage)
  }

  test("a WHEN/THEN inside literals or CASE expressions never splits clauses") {
    val segs = GraftSqlParser.splitWhenClauses(
      "WHEN MATCHED AND t.seg = 'WHEN x' THEN DELETE " +
        "WHEN MATCHED AND CASE WHEN t.p > 0 THEN true ELSE false END " +
        "THEN UPDATE SET p = 0 " +
        "WHEN NOT MATCHED THEN INSERT *")
    assert(segs.size == 3, segs.mkString(" || "))
    assert(segs(1).toLowerCase.contains("case when"), segs(1))
    // the cond/action THEN boundary skips the CASE's own arms
    val c = GraftSqlParser.parseWhenClause("spec", segs(1))
    assert(c.matched && c.cond.exists(_.toLowerCase.startsWith("case when")),
      c.toString)
    assert(c.action == MergeUpdateSet("p = 0"), c.toString)
    val d = GraftSqlParser.parseWhenClause("spec", segs(0))
    assert(d.cond.contains("t.seg = 'WHEN x'") && d.action == MergeDelete)
  }
}
