package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val salted = Skew.saltedSumCount(ev, "event_type", "value")
      .select(col("event_type"), round(col("sum"), 4).as("s"), col("cnt"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = ev.groupBy("event_type")
      .agg(round(sum(col("value")), 4).as("s"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, c)) =>
      assert(salted(k)._2 == c)
      assert(math.abs(salted(k)._1 - s) < 1e-6) // fp order differs by design
    }
  }

  test("salted join equals plain join") {
    val fact = Seq((1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0)).toDF("k", "v")
    val dim = Seq((1, "hot"), (2, "cold"), (3, "unused")).toDF("k", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 4)
      .groupBy("name").agg(sum("v").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == Map("hot" -> 60.0, "cold" -> 5.0))
  }

  test("hotKeys finds exactly the keys above the fraction, bounded") {
    // key 1: 60 rows (60%), key 2: 25 rows, 15 singletons
    val fact = ((0 until 60).map(_ => 1L) ++ (0 until 25).map(_ => 2L) ++
      (100L until 115L)).toDF("k")
    assert(Skew.hotKeys(fact, "k", minFrac = 0.3) == Seq(1L))
    assert(Skew.hotKeys(fact, "k", minFrac = 0.2) == Seq(1L, 2L))
    assert(Skew.hotKeys(fact, "k", minFrac = 0.9).isEmpty)
  }

  test("hotKeys with caller-supplied total matches the self-counting form") {
    val fact = ((0 until 60).map(_ => 1L) ++ (0 until 25).map(_ => 2L) ++
      (100L until 115L)).toDF("k")
    assert(Skew.hotKeys(fact, "k", 0.2, total = 100L) == Seq(1L, 2L))
    assert(Skew.hotKeys(fact, "k", 0.3, total = 100L) == Seq(1L))
  }

  test("sketch-path hot keys equal exact-path hot keys on the q191 synthetic") {
    // the q191 shape: ~30% of lineitem rows fold onto orderkey 1
    val fact = graft.Tables.load(spark, sf(), "lineitem")
      .select(when(pmod(col("l_orderkey"), lit(10)) < 3, 1L)
        .otherwise(col("l_orderkey")).as("okey"))
    for (frac <- Seq(0.05, 0.2)) {
      val exact = Skew.hotKeys(fact, "okey", frac)
      val sketch = Skew.hotKeysSketch(fact, "okey", frac)
      assert(sketch == exact, s"minFrac=$frac")
    }
    // nothing clears 90% — both paths agree on the empty set
    assert(Skew.hotKeysSketch(fact, "okey", 0.9).isEmpty)
  }

  test("null keys are excluded from detection on both paths (they never equi-join)") {
    // nulls hold 60% of rows; key 1 holds 30% — of NON-NULL rows, 75%
    val fact = ((0 until 60).map(_ => None: Option[Long]) ++
      (0 until 30).map(_ => Some(1L)) ++ (100L until 110L).map(Some(_))).toDF("k")
    assert(Skew.hotKeys(fact, "k", 0.5) == Seq(1L))
    assert(Skew.hotKeysSketch(fact, "k", 0.5) == Seq(1L))
  }

  test("sketch-path hot keys work on string keys and across partitions") {
    // 12 partitions force real partial-buffer merges (MG reduction +
    // CMS mergeInPlace) on both the exchange and the serialize path
    val rows = (0 until 3000).map(i =>
      if (i % 3 != 2) "hot" else s"cold-${i % 211}")
    val fact = spark.sparkContext.parallelize(rows, 12).toDF("k")
    assert(Skew.hotKeysSketch(fact, "k", 0.4) == Seq("hot"))
    assert(Skew.hotKeys(fact, "k", 0.4) == Seq("hot"))
  }

  test("hot-key salted join equals plain join, with and without hot keys") {
    val fact = ((0 until 50).map(i => (1L, i.toDouble)) ++
      Seq((2L, 5.0), (3L, 7.0), (9L, 1.0))).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "unused"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("name")
      .agg(sum("v").as("s"), count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    // hot path taken: key 1 is 50/53 of the fact
    val hot = Skew.saltedJoinHot(fact, dim, "k", minFrac = 0.1, salts = 4)
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(hot == plain)
    // no key clears 95%: degenerates to the plain single-path join
    val none = Skew.saltedJoinHot(fact, dim, "k", minFrac = 0.95, salts = 4)
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(none == plain)
    // sketch-driven detection: identical output rows
    val viaSketch = Skew.saltedJoinHot(fact, dim, "k", minFrac = 0.1,
        salts = 4, sketch = true)
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(viaSketch == plain)
  }
}
