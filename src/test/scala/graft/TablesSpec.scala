package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the schema-adaptive events.ts normalization: the driver has
  * regenerated the testdata with different PHYSICAL ts types across
  * rounds (TIMESTAMP(NANOS)-as-long, then plain micros TIMESTAMP_NTZ),
  * and every generation must read to the identical session-TZ
  * TimestampType values.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val micros = Seq(852076800000000L, 852076800123456L, 867715200999999L)

  test("normalizeTs maps long nanos, NTZ micros, and TIMESTAMP to equal values") {
    val fromLong = Tables.normalizeTs(
      micros.map(_ * 1000L).toDF("ts")) // nanos-as-long generation
    val fromNtz = Tables.normalizeTs(
      micros.toDF("us").select(timestamp_micros(col("us"))
        .cast(TimestampNTZType).as("ts"))) // current generation
    val fromTs = Tables.normalizeTs(
      micros.toDF("us").select(timestamp_micros(col("us")).as("ts")))
    for (df <- Seq(fromLong, fromNtz, fromTs))
      assert(df.schema("ts").dataType == TimestampType)
    val Seq(a, b, c) = Seq(fromLong, fromNtz, fromTs)
      .map(_.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted)
    assert(a == micros.sorted && b == micros.sorted && c == micros.sorted)
  }

  test("normalizeTs is a no-op without a ts column") {
    val df = Seq((1L, "x")).toDF("id", "s")
    assert(Tables.normalizeTs(df).collect().toSeq == df.collect().toSeq)
  }

  test("eventsStream resolves the on-disk ts type and yields TimestampType") {
    import org.apache.spark.sql.types.{StructField => F}
    val raw = Tables.eventsStream(spark, sf(), Seq(
      F("event_id", LongType), F("ts", LongType)))
    assert(raw.isStreaming)
    assert(raw.schema("ts").dataType == TimestampType)
    // batch read of the same file agrees on the values
    val batch = Tables.load(spark, sf(), "events")
      .select(col("event_id"), col("ts"))
    val got = graft.streaming.StreamJoin.runAvailableNow(spark, raw)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().toMap
    val want = batch.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}
