package graft.streaming

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream-static enrichment through the NATIVE as-of node: the
  * point-in-time feature lookup a streaming scorer needs (per
  * incoming event, the latest value of a slowly-changing feature
  * table at-or-before the event time) — planned per micro-batch by
  * the same AsOfJoinStrategy the batch path uses.
  */
class StreamAsOfSpec extends SparkSpec {

  test("stream-static as-of equals the batch as-of on the same corpus") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val errorsBatch = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val expected = AsOfJoin.lookupLastNative(errorsBatch, purchases,
        "user_id", "ts", "p_ts", "p_ts", "last_purchase_ts")
      .collect().map(_.toString).toSet

    val stream = graft.Tables.eventsStream(spark, sf(), Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts", LongType), StructField("event_type", StringType)))
      .where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val joined = AsOfJoin.lookupLastNative(stream, purchases,
      "user_id", "ts", "p_ts", "p_ts", "last_purchase_ts")
    assert(joined.isStreaming, "as-of over a stream must stay streaming")
    val got = StreamJoin.runAvailableNow(spark, joined)
      .collect().map(_.toString).toSet
    assert(got == expected)
  }
}
