package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiles counts, nulls, distincts, and numeric ranges per column") {
    val df = Seq(
      (1L, Some(2.5), "a"),
      (2L, None, "b"),
      (3L, Some(-1.0), "a")
    ).toDF("id", "x", "s")
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("id").getLong(1) == 3 && got("id").getLong(2) == 3 && got("id").getLong(3) == 0)
    assert(got("id").getDouble(4) == 1.0 && got("id").getDouble(5) == 3.0)
    assert(got("x").getLong(1) == 2 && got("x").getLong(3) == 1) // nulls not counted
    assert(got("x").getDouble(4) == -1.0 && got("x").getDouble(5) == 2.5)
    assert(got("s").getLong(2) == 2 && got("s").isNullAt(4) && got("s").isNullAt(5))
  }

  test("one pass: a single aggregate feeds every column's row") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    // exact multi-column distincts expand the input, but there must be
    // only one aggregate chain (one Expand), not one scan per column
    assert("Expand".r.findAllIn(plan).size <= 1, plan)
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 2, plan)
  }
}
