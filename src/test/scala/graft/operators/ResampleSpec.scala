package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Daily grid + forward fill: hand-checked gaps, per-key ranges,
  * duplicate-day determinism, null hygiene, partitioning invariance.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("gaps fill forward with provenance; grid spans each key's own range") {
    val src = Seq(
      (1L, "2020-01-01", 10L), (1L, "2020-01-04", 40L),
      (2L, "2020-02-10", 7L) // single observation: one-day grid
    ).toDF("k", "d", "v")
    val got = Resample.ffillDaily(src, "k", "d", "v")
      .orderBy("k", "d")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, "2020-01-01", 10L, false),
      (1L, "2020-01-02", 10L, true),
      (1L, "2020-01-03", 10L, true),
      (1L, "2020-01-04", 40L, false),
      (2L, "2020-02-10", 7L, false)))
  }

  test("duplicate days collapse to MAX; null dates/values drop") {
    val src = Seq(
      (Some(1L), Some("2020-01-01"), Some(5L)),
      (Some(1L), Some("2020-01-01"), Some(9L)), // dup day -> 9
      (Some(1L), None, Some(3L)),
      (Some(1L), Some("2020-01-02"), None)
    ).toDF("k", "d", "v")
    val got = Resample.ffillDaily(src, "k", "d", "v").collect()
    assert(got.length == 1 && got.head.getLong(2) == 9L)
  }

  test("the resample is partitioning-invariant on real data") {
    val src = graft.Tables.load(spark, sf(), "orders")
      .where(col("o_orderkey") % 17 === 0)
      .select(pmod(col("o_custkey"), lit(5)).as("k"),
        col("o_orderdate").as("d"), floor(col("o_totalprice")).as("v"))
    val a = Resample.ffillDaily(src, "k", "d", "v")
      .collect().map(_.toString).toSet
    val b = Resample.ffillDaily(src.repartition(7), "k", "d", "v")
      .collect().map(_.toString).toSet
    assert(a == b && a.nonEmpty)
  }
}
