package graft.plans

import graft.SparkSpec

/** Round-16: backtick-quoted identifiers across the SQL statement
  * tier. Every statement family must route a quoted (hyphenated, and
  * dotted-quoted) table name to graft exactly like a plain name —
  * previously such names silently fell through to a stock-Spark
  * resolution error — and unquoted behavior must be byte-identical to
  * before (the fall-through spec).
  */
class QuotedIdentSpec extends SparkSpec {

  private var n = 0
  private def freshRoot(): String = {
    n += 1
    graft.sources.Scratch.processScoped("quoted_spec", "spec") + s"/case$n"
  }

  private def withRoot[T](root: String)(body: => T): T = {
    spark.conf.set("spark.graft.store.root", root)
    try body finally spark.conf.unset("spark.graft.store.root")
  }

  test("cleanIdent / quoteIdent: canonicalization and exact round-trip") {
    assert(GraftSqlParser.cleanIdent("plain") == "plain")
    assert(GraftSqlParser.cleanIdent("a.b") == "a.b")
    assert(GraftSqlParser.cleanIdent("`my-table`") == "my-table")
    assert(GraftSqlParser.cleanIdent("a.`b-c`") == "a.b-c")
    assert(GraftSqlParser.cleanIdent("`a``b`") == "a`b",
      "doubled backtick is a literal backtick")
    assert(GraftSqlParser.cleanIdent("`x y`") == "x y")
    assert(GraftSqlParser.quoteIdent("plain") == "plain")
    assert(GraftSqlParser.quoteIdent("a.b") == "a.b")
    assert(GraftSqlParser.quoteIdent("my-table") == "`my-table`")
    // quote→clean is identity on every canonical name
    Seq("plain", "a.b", "my-table", "a.b-c", "x y").foreach { nm =>
      assert(GraftSqlParser.cleanIdent(GraftSqlParser.quoteIdent(nm)) == nm)
    }
  }

  test("splitOptimizeTail: mask walk, not regex — a literal holding " +
      "CLUSTER BY text never truncates the predicate") {
    assert(GraftSqlParser.splitOptimizeTail("") == Some((None, Nil)))
    assert(GraftSqlParser.splitOptimizeTail("WHERE k >= 6") ==
      Some((Some("k >= 6"), Nil)))
    assert(GraftSqlParser.splitOptimizeTail("CLUSTER BY (a, b)") ==
      Some((None, Seq("a", "b"))))
    assert(GraftSqlParser.splitOptimizeTail("WHERE k >= 6 CLUSTER BY (a)") ==
      Some((Some("k >= 6"), Seq("a"))))
    // the round-15 hazard: CLUSTER BY inside a string literal is
    // predicate CONTENT, not a clause boundary
    assert(GraftSqlParser.splitOptimizeTail("WHERE v = 'CLUSTER BY (x)'") ==
      Some((Some("v = 'CLUSTER BY (x)'"), Nil)))
    // inside parens (a subquery) is not top-level either
    assert(GraftSqlParser.splitOptimizeTail(
      "WHERE k IN (SELECT k FROM t /* CLUSTER BY (x) */)").exists(
      _._1.exists(_.contains("SELECT"))))
    // quoted cluster columns normalize
    assert(GraftSqlParser.splitOptimizeTail("CLUSTER BY (`a-1`, b)") ==
      Some((None, Seq("a-1", "b"))))
    // ZORDER BY is a spelling alias for CLUSTER BY (the Delta habit)
    assert(GraftSqlParser.splitOptimizeTail("ZORDER BY (a, b)") ==
      Some((None, Seq("a", "b"))))
    assert(GraftSqlParser.splitOptimizeTail("WHERE k >= 6 ZORDER BY (a)") ==
      Some((Some("k >= 6"), Seq("a"))))
    // junk tail → None (falls through to the delegate's error)
    assert(GraftSqlParser.splitOptimizeTail("FULL").isEmpty)
  }

  test("validateTableName: reserved characters refuse at CREATE") {
    val root = freshRoot()
    withRoot(root) {
      Seq("a/b", "a$b", "a`b", "a'b", "a\"b").foreach { bad =>
        val q = "`" + bad.replace("`", "``") + "`"
        val t = scala.util.Try(
          spark.sql(s"CREATE TABLE $q (k BIGINT) USING graft"))
        assert(t.isFailure && t.failed.get.getMessage.contains("reserved"),
          s"$bad: $t")
      }
      val dots = scala.util.Try(
        spark.sql("CREATE TABLE `..` (k BIGINT) USING graft"))
      assert(dots.isFailure &&
        dots.failed.get.getMessage.contains("path dot"), dots.toString)
    }
  }

  test("hyphenated quoted name: the full statement lifecycle routes to graft") {
    val root = freshRoot()
    withRoot(root) {
      val q = "`r16-tbl`"
      spark.sql(s"CREATE TABLE $q (k BIGINT, v STRING, extra BIGINT) " +
        "USING graft PRIMARY KEY k")
      assert(GraftTableRegistry.lookup("r16-tbl").nonEmpty,
        "the registry keys on the canonical (unquoted) name")
      spark.sql(s"INSERT INTO $q VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
      spark.sql(s"INSERT INTO $q (k, v) SELECT 4, 'd'")
      spark.sql(s"UPDATE $q SET v = 'bb' WHERE k = 2")
      spark.sql(s"DELETE FROM $q WHERE k = 3")
      assert(spark.sql(s"SELECT k, v FROM $q ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "bb"), (4L, "d")))
      // merge with a quoted target and an inline subquery source
      spark.sql(s"""MERGE INTO $q AS t USING
        (SELECT 2 AS k, 'B' AS v, 99 AS extra UNION ALL
         SELECT 9, 'z', 9) AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v, extra) VALUES (s.k, s.v, s.extra)""")
      assert(spark.sql(s"SELECT v FROM $q WHERE k = 2").head().getString(0) == "B")
      assert(spark.sql(s"SELECT count(*) FROM $q").head().getLong(0) == 4L)
      // time travel + history + changes on the quoted spelling
      assert(spark.sql(s"SELECT * FROM $q VERSION AS OF 2").count() == 3L)
      assert(spark.sql(s"DESCRIBE HISTORY $q").count() >= 5L)
      val feed = spark.sql(s"SELECT * FROM $q CHANGES FROM 2 TO LATEST")
      assert(feed.count() > 0L)
      // maintenance family
      assert(spark.sql(s"DESCRIBE DETAIL $q").head().getString(0) == "r16-tbl")
      spark.sql(s"ANALYZE TABLE $q COMPUTE STATISTICS FOR COLUMNS k")
      spark.sql(s"ALTER TABLE $q ADD COLUMNS (w DOUBLE)")
      spark.sql(s"ALTER TABLE $q ADD CONSTRAINT kpos CHECK (k > 0)")
      val viol = scala.util.Try(
        spark.sql(s"INSERT INTO $q VALUES (-1, 'x', 0, 0.0)").collect())
      assert(viol.isFailure, "the CHECK guards the quoted table's writes")
      spark.sql(s"ALTER TABLE $q DROP CONSTRAINT kpos")
      spark.sql(s"OPTIMIZE $q")
      spark.sql(s"VACUUM $q RETAIN 1 VERSIONS DRY RUN")
      spark.sql(s"RESTORE TABLE $q TO VERSION AS OF 2")
      assert(spark.sql(s"SELECT count(*) FROM $q").head().getLong(0) == 3L)
      // SHOW CREATE re-quotes; replay round-trips to the same binding
      val stmts = spark.sql(s"SHOW CREATE TABLE $q").collect()
        .map(_.getString(0)).toSeq
      assert(stmts.head.startsWith("CREATE TABLE IF NOT EXISTS `r16-tbl`"),
        stmts.head)
      spark.sql(s"DROP TABLE $q")
      assert(GraftTableRegistry.lookup("r16-tbl").isEmpty)
      GraftTableRegistry.clearInMemory()
      stmts.foreach(spark.sql(_))
      assert(spark.sql(s"SELECT count(*) FROM $q").head().getLong(0) == 3L)
      spark.sql(s"DROP TABLE $q")
    }
  }

  test("dotted-quoted name: `a.\\`b-c\\`` canonicalizes to one a.b-c key") {
    val root = freshRoot()
    withRoot(root) {
      val t = scala.util.Try {
        spark.sql("CREATE TABLE ns16.`seg-b` (k BIGINT, v STRING) USING graft")
        assert(GraftTableRegistry.lookup("ns16.seg-b").nonEmpty)
        spark.sql("INSERT INTO ns16.`seg-b` VALUES (1, 'a'), (2, 'b')")
        spark.sql("TRUNCATE TABLE ns16.`seg-b`")
        assert(spark.sql("SELECT * FROM `ns16.seg-b`").count() == 0L,
          "the single-quoted whole-name spelling addresses the same table")
        assert(spark.sql(
          "SELECT * FROM ns16.`seg-b` VERSION AS OF 2").count() == 2L)
      }
      spark.sql("DROP TABLE ns16.`seg-b`")
      t.get
    }
  }

  test("COPY INTO / REPLACE WHERE / OVERWRITE / CTAS / RENAME accept quoted names") {
    val root = freshRoot()
    withRoot(root) {
      import spark.implicits._
      val land = root + "/land"
      Seq((1L, 5.0), (2L, 6.0)).toDF("k", "p").write.parquet(land)
      spark.sql("CREATE TABLE `cp-16` (k BIGINT, p DOUBLE) USING graft " +
        "PRIMARY KEY k")
      val r = spark.sql(
        s"COPY INTO `cp-16` FROM '$land' FILEFORMAT = PARQUET").head()
      assert(r.getLong(3) == 2L, s"rows loaded: $r")
      spark.sql("INSERT INTO `cp-16` REPLACE WHERE k >= 2 SELECT 2, 60.0")
      assert(spark.sql("SELECT p FROM `cp-16` WHERE k = 2").head()
        .getDouble(0) == 60.0)
      spark.sql("INSERT OVERWRITE `cp-16` VALUES (7, 1.0)")
      assert(spark.sql("SELECT * FROM `cp-16`").count() == 1L)
      // CTAS with a quoted name, then the catalog-move RENAME
      spark.sql("CREATE TABLE `ctas-16` USING graft PRIMARY KEY k " +
        "AS SELECT * FROM `cp-16`")
      spark.sql("ALTER TABLE `ctas-16` RENAME TO plain16")
      assert(GraftTableRegistry.lookup("ctas-16").isEmpty &&
        GraftTableRegistry.lookup("plain16").nonEmpty)
      assert(spark.sql("SELECT * FROM plain16").count() == 1L)
      spark.sql("DROP TABLE plain16")
      spark.sql("DROP TABLE `cp-16`")
    }
  }

  test("fall-through: quoted names NOT registered reach the stock parser, " +
      "and literals holding statement text stay verbatim") {
    val root = freshRoot()
    withRoot(root) {
      // an unregistered quoted name is not claimed — the stock analyzer
      // reports its own missing-table error, not a graft one
      val e = intercept[Exception](
        spark.sql("DELETE FROM `no-such-16` WHERE k = 1").collect())
      assert(!e.getMessage.contains("graft"), e.getMessage)
      // a string literal containing `x` VERSION AS OF 3 is DATA
      spark.sql("CREATE TABLE ft16 (k BIGINT, v STRING) USING graft")
      spark.sql("INSERT INTO ft16 VALUES (1, '`x` VERSION AS OF 3')")
      assert(spark.sql("SELECT v FROM ft16").head().getString(0) ==
        "`x` VERSION AS OF 3")
      // OPTIMIZE with the literal-hazard predicate: content unchanged,
      // the literal is predicate content, not cluster columns
      spark.sql("OPTIMIZE ft16 WHERE v = 'CLUSTER BY (x)'")
      assert(spark.sql("SELECT count(*) FROM ft16").head().getLong(0) == 1L)
      assert(GraftTableRegistry.lookupCluster("ft16").isEmpty)
      spark.sql("DROP TABLE ft16")
    }
  }
}
