package graft.plans

import graft.SparkSpec

/** Round-16: PIN the INSERT-by-SELECT binding semantics (the r15
  * verdict's doc item): `INSERT INTO t SELECT …` binds the payload
  * POSITIONALLY — Delta-compatible — even when the SELECT's column
  * names match the table's in a different order; the type-cast guard
  * runs after the positional rename. `INSERT INTO t (cols) SELECT …`
  * is the name-targeted escape hatch, and CSV COPY INTO binds by
  * header name. All three documented in the README's SQL table.
  */
class InsertBindingSpec extends SparkSpec {

  private var n = 0
  private def withRoot[T](body: => T): T = {
    n += 1
    val root =
      graft.sources.Scratch.processScoped("insbind_spec", "spec") + s"/case$n"
    spark.conf.set("spark.graft.store.root", root)
    try body finally spark.conf.unset("spark.graft.store.root")
  }

  test("INSERT INTO t SELECT binds by POSITION, not by name (pinned)") {
    withRoot {
      spark.sql("CREATE TABLE ib1 (k BIGINT, cust BIGINT) USING graft")
      // the SELECT names both columns correctly but in swapped order —
      // positional binding lands cust's values in k (the documented,
      // Delta-compatible semantics; same-typed columns cannot be told
      // apart by any cast guard)
      spark.sql("INSERT INTO ib1 SELECT 77L AS cust, 1L AS k")
      val r = spark.sql("SELECT k, cust FROM ib1").head()
      assert(r.getLong(0) == 77L && r.getLong(1) == 1L,
        s"positional binding is the contract: $r")
      // the COLUMN-LIST form is the by-name escape hatch
      spark.sql("INSERT INTO ib1 (cust, k) SELECT 88L AS cust, 2L AS k")
      val byName = spark.sql("SELECT k, cust FROM ib1 WHERE k = 2").head()
      assert(byName.getLong(0) == 2L && byName.getLong(1) == 88L, s"$byName")
      spark.sql("DROP TABLE ib1")
    }
  }

  test("positional binding still type-guards: an incompatible value " +
      "fails the write job, never lands NULL") {
    withRoot {
      spark.sql("CREATE TABLE ib2 (k BIGINT, p DOUBLE) USING graft")
      val bad = scala.util.Try(
        spark.sql("INSERT INTO ib2 VALUES (1, 'not-a-number')").collect())
      // ANSI mode fails the cast itself; with ANSI off the aligned
      // payload's raise_error guard fires instead — either way the
      // write job aborts loudly naming the value
      assert(bad.isFailure && (
        bad.failed.get.getMessage.contains("not a valid") ||
        bad.failed.get.getMessage.contains("CAST_INVALID_INPUT")),
        bad.toString)
      assert(spark.sql("SELECT count(*) FROM ib2").head().getLong(0) == 0L)
      spark.sql("DROP TABLE ib2")
    }
  }
}
