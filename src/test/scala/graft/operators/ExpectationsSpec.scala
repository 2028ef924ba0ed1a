package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private def report(df: org.apache.spark.sql.DataFrame, checks: Seq[Check]) =
    validate(df, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("every check type counts its violations exactly") {
    val fact = Seq(
      (1L, Option(10L), "O", 5.0),
      (2L, Option(20L), "F", -1.0),  // range violation
      (3L, None, "O", 7.0),          // null violation (and skipped by FK)
      (3L, Option(10L), "X", 8.0),   // dup key + bad status
      (4L, Option(99L), "O", 9.0)    // dangling FK
    ).toDF("k", "fk", "st", "p")
    val dim = Seq(10L, 20L).toDF("id")
    val got = report(fact, Seq(
      NotNull("fk"), InRange("p", 0.0, 100.0), AcceptedValues("st", Seq("O", "F")),
      Unique(Seq("k")), ForeignKey("fk", dim, "id")))
    assert(got("not_null:fk") == ((1L, false)))
    assert(got("in_range:p") == ((1L, false)))
    assert(got("accepted_values:st") == ((1L, false)))
    assert(got("unique:k") == ((1L, false)))
    assert(got("foreign_key:fk") == ((1L, false)))
  }

  test("a clean table passes everything; null range values violate the contract") {
    val fact = Seq((1L, Option(10L), "O", 5.0), (2L, Option(20L), "F", 6.0))
      .toDF("k", "fk", "st", "p")
    val dim = Seq(10L, 20L).toDF("id")
    val got = report(fact, Seq(
      NotNull("fk"), InRange("p", 0.0, 100.0), AcceptedValues("st", Seq("O", "F")),
      Unique(Seq("k")), ForeignKey("fk", dim, "id")))
    assert(got.values.forall(_ == ((0L, true))), got.toString)
    // null in a range-checked column is a violation, not a pass
    val withNull = Seq((1L, Option(5.0)), (2L, Option(6.0)), (5L, None))
      .toDF("k", "p")
    val got2 = report(withNull, Seq(InRange("p", 0.0, 100.0)))
    assert(got2("in_range:p") == ((1L, false)))
  }

  test("row-level checks fold into one aggregate pass (single scan, no joins)") {
    val fact = Seq((1L, "O", 5.0), (2L, "F", 6.0)).toDF("k", "st", "p")
    val df = validate(fact, Seq(
      NotNull("k"), InRange("p", 0.0, 10.0), AcceptedValues("st", Seq("O", "F"))))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    // one scan of the fact table only
    assert("LocalTableScan|Scan".r.findAllIn(p).length <= 2, p)
  }

  test("empty table: zero violations everywhere, not null counts") {
    val fact = Seq.empty[(Long, String)].toDF("k", "st")
    val got = report(fact, Seq(NotNull("k"), Unique(Seq("k"))))
    assert(got("not_null:k") == ((0L, true)))
    assert(got("unique:k") == ((0L, true)))
  }

  test("violationGate routes rows: OR of row checks, set checks ignored") {
    val df = Seq(
      (1L, Some(10.0), "ok"),      // clean
      (2L, Some(500.0), "ok"),     // range violation
      (3L, None, "ok"),            // null value -> range violation
      (4L, Some(10.0), "bad")      // accepted-values violation
    ).toDF("k", "v", "st")
    val gate = Expectations.violationGate(Seq(
      InRange("v", 0.0, 100.0), AcceptedValues("st", Seq("ok")),
      Unique(Seq("k")) // set-level: must not affect routing
    ))
    val bad = df.where(gate).select("k").as[Long].collect().toSet
    assert(bad == Set(2L, 3L, 4L))
    assert(df.where(!gate).select("k").as[Long].collect().toSeq == Seq(1L))
  }
}
