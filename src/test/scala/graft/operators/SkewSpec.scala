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
}
