package graft.plans

import graft.SparkSpec

/** Round-16 second wave: `ALTER TABLE … RENAME COLUMN a TO b`
  * (metadata-only, two physical column eras coalesced at read), the
  * bare `DELETE FROM t` (remove-all under DELETE's spelling), and
  * `DESCRIBE [TABLE] t` for registered graft names.
  */
class RenameColumnSpec extends SparkSpec {

  private var n = 0
  private def withRoot[T](body: String => T): T = {
    n += 1
    val root =
      graft.sources.Scratch.processScoped("renamecol_spec", "spec") + s"/case$n"
    spark.conf.set("spark.graft.store.root", root)
    try body(root) finally spark.conf.unset("spark.graft.store.root")
  }

  test("RENAME COLUMN spans both eras: old dirs read under the new name, " +
      "new writes land it physically, OPTIMIZE localizes") {
    withRoot { _ =>
      spark.sql("CREATE TABLE rc1 (k BIGINT, old_v DOUBLE) USING graft " +
        "PRIMARY KEY k")
      spark.sql("INSERT INTO rc1 VALUES (1, 1.5), (2, 2.5)")
      val (st, view) = GraftTableRegistry.lookup("rc1").get
      val dirsBefore = st.manifestDirs(view)
      val preRename = st.versions(view).max
      spark.sql("ALTER TABLE rc1 RENAME COLUMN old_v TO v")
      assert(st.manifestDirs(view) == dirsBefore, "zero data IO")
      // old-era rows surface under the NEW name
      assert(spark.sql("SELECT v FROM rc1 WHERE k = 1").head()
        .getDouble(0) == 1.5)
      // time travel keeps each version's own spelling
      assert(spark.sql(s"SELECT old_v FROM rc1 VERSION AS OF $preRename")
        .count() == 2L)
      // new-era writes land the new name; both eras coalesce
      spark.sql("INSERT INTO rc1 VALUES (3, 3.5)")
      spark.sql("UPDATE rc1 SET v = v + 10 WHERE k = 2")
      assert(spark.sql("SELECT sum(v) FROM rc1").head().getDouble(0) ==
        1.5 + 12.5 + 3.5)
      // keyed DML kept working through the rename (k untouched), and a
      // KEY rename rebinds the registry
      spark.sql("ALTER TABLE rc1 RENAME COLUMN k TO id")
      assert(GraftTableRegistry.lookupKey("rc1").contains("id"))
      spark.sql("UPDATE rc1 SET v = 0.0 WHERE id = 3")
      assert(spark.sql("SELECT v FROM rc1 WHERE id = 3").head()
        .getDouble(0) == 0.0)
      // the rebind persisted: a restarted JVM keys on the new spelling
      GraftTableRegistry.clearInMemory()
      assert(GraftTableRegistry.lookupKey("rc1").contains("id"))
      // reusing the old name refuses until a rewrite localizes
      val reuse = scala.util.Try(
        spark.sql("ALTER TABLE rc1 ADD COLUMNS (old_v DOUBLE)").collect())
      assert(reuse.isFailure &&
        reuse.failed.get.getMessage.contains("pending rename"),
        reuse.toString)
      spark.sql("OPTIMIZE rc1")
      val head = st.versions(view).max
      assert(st.manifestRenames(view, head).isEmpty,
        "the full rewrite localizes the rename and clears the list")
      spark.sql("ALTER TABLE rc1 ADD COLUMNS (old_v DOUBLE)")
      assert(spark.sql("SELECT old_v FROM rc1 WHERE id = 1").head().isNullAt(0))
      spark.sql("DROP TABLE rc1")
    }
  }

  test("RENAME COLUMN refusals and guards") {
    withRoot { _ =>
      spark.sql("CREATE TABLE rc2 (k BIGINT, a BIGINT, v STRING) " +
        "USING graft PRIMARY KEY k CLUSTER BY (a)")
      spark.sql("INSERT INTO rc2 VALUES (1, 2, 'x')")
      spark.sql("ALTER TABLE rc2 ADD CONSTRAINT vnn CHECK (v IS NOT NULL)")
      // round-17: a CHECK-referenced rename FOLLOWS instead of refusing
      // — the stored expression rewrites mechanically and keeps
      // enforcing under the new spelling
      spark.sql("ALTER TABLE rc2 RENAME COLUMN v TO w")
      assert(GraftTableRegistry.lookupChecks("rc2").head._2.contains("w"))
      assert(scala.util.Try(spark.sql(
        "INSERT INTO rc2 VALUES (5, 5, NULL)").collect()).isFailure,
        "the migrated constraint must still enforce")
      val taken = scala.util.Try(
        spark.sql("ALTER TABLE rc2 RENAME COLUMN a TO w").collect())
      assert(taken.isFailure &&
        taken.failed.get.getMessage.contains("already exists"),
        taken.toString)
      // a CLUSTER BY column rename rebinds the declared layout
      spark.sql("ALTER TABLE rc2 RENAME COLUMN a TO a2")
      assert(GraftTableRegistry.lookupCluster("rc2") == Seq("a2"))
      spark.sql("INSERT INTO rc2 VALUES (9, 9, 'y')")
      assert(spark.sql("SELECT count(*) FROM rc2 WHERE a2 = 9")
        .head().getLong(0) == 1L)
      spark.sql("DROP TABLE rc2")
    }
  }

  test("residue-name guards: RENAME cannot target a dropped or " +
      "renamed-away name; multi-column DROP is atomic") {
    withRoot { _ =>
      spark.sql("CREATE TABLE rg1 (k BIGINT, a DOUBLE, c DOUBLE, " +
        "d DOUBLE) USING graft PRIMARY KEY k")
      spark.sql("INSERT INTO rg1 VALUES (1, 1.0, 2.0, 3.0)")
      spark.sql("ALTER TABLE rg1 RENAME COLUMN a TO b")
      // `a`'s bytes remain in the old dirs — renaming c ONTO a would
      // bleed its values through the a>b coalesce (review finding)
      val ontoSrc = scala.util.Try(
        spark.sql("ALTER TABLE rg1 RENAME COLUMN c TO a").collect())
      assert(ontoSrc.isFailure &&
        ontoSrc.failed.get.getMessage.contains("bytes remain"),
        ontoSrc.toString)
      spark.sql("ALTER TABLE rg1 DROP COLUMN d")
      val ontoDropped = scala.util.Try(
        spark.sql("ALTER TABLE rg1 RENAME COLUMN c TO d").collect())
      assert(ontoDropped.isFailure &&
        ontoDropped.failed.get.getMessage.contains("bytes remain"),
        ontoDropped.toString)
      // multi-column DROP validates the WHOLE list before publishing —
      // a bad name leaves nothing half-dropped
      val (st, view) = GraftTableRegistry.lookup("rg1").get
      val v = st.versions(view).max
      val bad = scala.util.Try(
        spark.sql("ALTER TABLE rg1 DROP COLUMNS c, bogus").collect())
      assert(bad.isFailure && st.versions(view).max == v,
        s"a failed multi-drop must publish nothing: $bad")
      assert(spark.sql("SELECT * FROM rg1").columns.contains("c"))
      spark.sql("DROP TABLE rg1")
    }
  }

  test("a quoted NON-graft merge source keeps its ORIGINAL spelling for " +
      "spark.table (srcRaw pass-through — canonicalization collapses " +
      "quoted multi-part structure)") {
    withRoot { root =>
      spark.sql("CREATE TABLE mt1 (k BIGINT, v DOUBLE) USING graft " +
        "PRIMARY KEY k")
      val plan = GraftSqlParser.parseMaintenance(
        "MERGE INTO mt1 USING `my db`.src ON mt1.k = src.k " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      plan match {
        case Some(m: GraftMergeCommand) =>
          // the canonical name keys any graft lookup; the raw spelling
          // is what a non-graft spark.table resolution must receive —
          // "my db.src" as one identifier would resolve wrongly
          assert(m.srcName == "my db.src" && m.srcRaw == "`my db`.src",
            m.toString)
        case other => fail(s"expected GraftMergeCommand, got $other")
      }
      spark.sql("DROP TABLE mt1")
    }
  }

  test("SYNC AS OF on an unregistered name leaves the statement " +
      "verbatim (registry-gated rewrite)") {
    val t = scala.util.Try(
      spark.sql("SELECT * FROM not_a_graft_tbl SYNC AS OF LATEST").collect())
    assert(t.isFailure &&
      !t.failed.get.getMessage.contains("$sync$"),
      s"the error must reference the ORIGINAL text, not a mangled id: $t")
  }

  test("CHANGES across a rename boundary: the feed reports the column " +
      "move as drop+add per key (pinned semantics, like Delta sans " +
      "column mapping)") {
    withRoot { _ =>
      spark.sql("CREATE TABLE rc3 (k BIGINT, a DOUBLE) USING graft " +
        "PRIMARY KEY k")
      spark.sql("INSERT INTO rc3 VALUES (1, 1.0)")
      spark.sql("ALTER TABLE rc3 RENAME COLUMN a TO b")
      val (st, view) = GraftTableRegistry.lookup("rc3").get
      val head = st.versions(view).max
      // each side of the diff reads with ITS OWN version's naming, so
      // the rename surfaces as (a: 1.0 -> NULL, b: NULL -> 1.0) —
      // value-identical, but the feed treats it as an update (no
      // column-identity mapping; pin it so the contract is explicit)
      val feed = spark.sql(
        s"SELECT * FROM rc3 CHANGES FROM ${head - 1} TO $head").collect()
      assert(feed.length == 1 &&
        feed.head.getAs[String]("change_type") == "update", feed.toSeq)
      assert(feed.head.getAs[Double]("a_pre") == 1.0 &&
        feed.head.getAs[Double]("b_post") == 1.0, feed.toSeq)
      spark.sql("DROP TABLE rc3")
    }
  }

  test("OPTIMIZE accepts the ZORDER BY spelling end to end") {
    withRoot { _ =>
      spark.sql("CREATE TABLE zo1 (k BIGINT, a BIGINT, b BIGINT) USING graft")
      spark.sql("INSERT INTO zo1 SELECT id, id % 8, id DIV 8 " +
        "FROM range(0, 64)")
      spark.sql("OPTIMIZE zo1 ZORDER BY (a, b)")
      val (st, view) = GraftTableRegistry.lookup("zo1").get
      val (_, skip) = st.pruneDirsBox("zo1",
        Seq(("a", "1", "1"), ("b", "1", "1")))
      assert(skip.nonEmpty, "the zordered layout must box-prune")
      spark.sql("DROP TABLE zo1")
    }
  }

  test("bare DELETE FROM t removes all rows, history travelable") {
    withRoot { _ =>
      spark.sql("CREATE TABLE da1 (k BIGINT, v STRING) USING graft")
      spark.sql("INSERT INTO da1 VALUES (1, 'a'), (2, 'b')")
      val (st, view) = GraftTableRegistry.lookup("da1").get
      val pre = st.versions(view).max
      spark.sql("DELETE FROM da1")
      assert(spark.sql("SELECT * FROM da1").count() == 0L)
      assert(spark.sql(s"SELECT * FROM da1 VERSION AS OF $pre").count() == 2L)
      // an unregistered bare DELETE still falls through to stock Spark
      val e = intercept[Exception](
        spark.sql("DELETE FROM no_such_da WHERE 1=1").collect())
      assert(!e.getMessage.contains("graft"), e.getMessage)
      spark.sql("DROP TABLE da1")
    }
  }

  test("DESCRIBE TABLE lists the merged schema with key/layout markers") {
    withRoot { _ =>
      spark.sql("CREATE TABLE dt1 (k BIGINT, a BIGINT, v STRING) " +
        "USING graft PRIMARY KEY k CLUSTER BY (a)")
      val rows = spark.sql("DESCRIBE TABLE dt1").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      assert(rows == Seq(
        ("k", "bigint", "primary key"),
        ("a", "bigint", "cluster by"),
        ("v", "string", null)), rows.toString)
      // the short spelling works; renames/drops reflect immediately
      spark.sql("ALTER TABLE dt1 RENAME COLUMN v TO w")
      val cols = spark.sql("DESC dt1").collect().map(_.getString(0)).toSeq
      assert(cols == Seq("k", "a", "w"), cols.toString)
      // unregistered names still reach the stock DESCRIBE path
      val e = intercept[Exception](
        spark.sql("DESCRIBE TABLE no_such_dt").collect())
      assert(!e.getMessage.contains("graft"), e.getMessage)
      spark.sql("DROP TABLE dt1")
    }
  }
}
