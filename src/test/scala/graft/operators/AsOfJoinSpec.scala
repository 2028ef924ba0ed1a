package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("lookupLast matches naive max-at-or-before semantics") {
    val left = Seq((1L, "k1", 10L), (2L, "k1", 25L), (3L, "k2", 5L), (4L, "k3", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 8L, 100.0), ("k1", 10L, 200.0), ("k1", 20L, 300.0),
        ("k2", 6L, 400.0), ("k3", 50L, 500.0))
      .toDF("k", "rt", "rv")

    val got = AsOfJoin.lookupLast(left, right, "k", "t", "rt", "rv", "asof")
      .select("id", "asof").as[(Long, Option[Double])].collect().toMap

    // id1: rt<=10 => {8:100, 10:200} -> 200 (inclusive); id2: all -> 300
    // id3: rt<=5 => none -> null;     id4: equal time inclusive -> 500
    assert(got(1L).contains(200.0))
    assert(got(2L).contains(300.0))
    assert(got(3L).isEmpty)
    assert(got(4L).contains(500.0))
  }

  test("lookupLastWithin: stale matches null out, inclusive at the bound") {
    val left = Seq((1L, "k1", 10L), (2L, "k1", 25L), (3L, "k1", 30L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 8L, 100.0), ("k1", 20L, 300.0)).toDF("k", "rt", "rv")
    val got = AsOfJoin.lookupLastWithin(left, right, "k", "t", "rt", "rv",
        "asof", tolerance = lit(5L))
      .select("id", "asof").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(100.0)) // age 2 <= 5
    assert(got(2L).contains(300.0)) // age exactly 5: inclusive
    assert(got(3L).isEmpty)         // age 10: stale, nulled
  }

  test("lookupLastWithin with infinite tolerance equals lookupLast") {
    val left = Seq((1L, "k1", 10L), (2L, "k1", 25L), (3L, "k2", 5L), (4L, "k3", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 8L, 100.0), ("k1", 10L, 200.0), ("k1", 20L, 300.0),
        ("k2", 6L, 400.0), ("k3", 50L, 500.0))
      .toDF("k", "rt", "rv")
    val a = AsOfJoin.lookupLastWithin(left, right, "k", "t", "rt", "rv",
        "asof", tolerance = lit(Long.MaxValue / 2))
      .select("id", "asof").as[(Long, Option[Double])].collect().toMap
    val b = AsOfJoin.lookupLast(left, right, "k", "t", "rt", "rv", "asof")
      .select("id", "asof").as[(Long, Option[Double])].collect().toMap
    assert(a == b)
  }

  test("lookupNext matches naive min-at-or-after semantics") {
    val left = Seq((1L, "k1", 10L), (2L, "k1", 25L), (3L, "k2", 5L), (4L, "k3", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 8L, 100.0), ("k1", 10L, 200.0), ("k1", 20L, 300.0),
        ("k2", 6L, 400.0), ("k3", 50L, 500.0))
      .toDF("k", "rt", "rv")
    val got = AsOfJoin.lookupNext(left, right, "k", "t", "rt", "rv", "next")
      .select("id", "next").as[(Long, Option[Double])].collect().toMap
    // id1: rt>=10 earliest = 10 (inclusive) -> 200; id2: none after 25? 20<25 -> null
    // id3: rt>=5 earliest = 6 -> 400;       id4: equal time inclusive -> 500
    assert(got(1L).contains(200.0))
    assert(got(2L).isEmpty)
    assert(got(3L).contains(400.0))
    assert(got(4L).contains(500.0))
  }

  test("lookupNext ties at equal earliest time resolve to min value") {
    val left = Seq((1L, "k", 10L)).toDF("id", "k", "t")
    val right = Seq(("k", 10L, 5.0), ("k", 10L, 9.0), ("k", 12L, 1.0)).toDF("k", "rt", "rv")
    val got = AsOfJoin.lookupNext(left, right, "k", "t", "rt", "rv", "next")
      .select("next").as[Double].head()
    assert(got == 5.0)
  }

  test("right-side ties at equal time resolve to max value") {
    val left = Seq((1L, "k", 10L)).toDF("id", "k", "t")
    val right = Seq(("k", 10L, 5.0), ("k", 10L, 9.0), ("k", 10L, 1.0)).toDF("k", "rt", "rv")
    val got = AsOfJoin.lookupLast(left, right, "k", "t", "rt", "rv", "asof")
      .select("asof").as[Double].head()
    assert(got == 9.0)
  }

  test("matches correlated-subquery semantics on real events data") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val got = graft.queries.CoreQueries.queries("q10_asof_join")(spark, sf())
    // naive: join + groupBy max
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val naive = errors.join(purchases, col("user_id") === col("pu") && col("pts") <= col("ts"), "left")
      .groupBy("event_id").agg(max(col("pts")).as("naive_ts"))
    val joined = got.join(naive, Seq("event_id"), "inner")
      .select(col("event_id"),
        col("last_purchase_ts").cast("string").as("a"),
        col("naive_ts").cast("timestamp_ntz").cast("string").as("b"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("a") == r.getAs[String]("b"),
        s"mismatch for ${r.getLong(0)}: ${r.getAs[String]("a")} vs ${r.getAs[String]("b")}")
    }
  }
}
