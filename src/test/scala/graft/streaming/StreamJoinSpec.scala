package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream inner join with watermarks on both sides — the
  * fully-streaming form of the batch layer's daily stock×news join
  * (J1), with state bounded by the watermark instead of a view store.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked stream-stream join matches ticks to news per day") {
    implicit val sqlCtx = spark.sqlContext
    val tickMem = MemoryStream[(String, Double)]
    val newsMem = MemoryStream[(String, Double)]

    val ticks = tickMem.toDF().toDF("Date", "Close")
      .withColumn("t_ts", to_timestamp(col("Date")))
      .withWatermark("t_ts", "2 days")
    val news = newsMem.toDF().toDF("Date2", "score")
      .withColumn("n_ts", to_timestamp(col("Date2")))
      .withWatermark("n_ts", "2 days")

    val joined = ticks.join(news, col("t_ts") === col("n_ts"), "inner")
      .select(col("Date"), col("Close"), col("score"))

    val q = joined.writeStream.format("memory").queryName("ssj_t")
      .outputMode("append").start()

    tickMem.addData(("2026-08-10", 100.0), ("2026-08-11", 101.0))
    newsMem.addData(("2026-08-10", 0.8))
    q.processAllAvailable()
    newsMem.addData(("2026-08-11", 0.2), ("2026-08-12", 0.5)) // 12th has no tick
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_t").as[(String, Double, Double)].collect().toSet
    assert(rows == Set(("2026-08-10", 100.0, 0.8), ("2026-08-11", 101.0, 0.2)))
  }

  test("intervalJoin matches right rows inside [leftTs, leftTs + upper] per key") {
    implicit val sqlCtx = spark.sqlContext
    val viewMem = MemoryStream[(Long, Long, String)]
    val buyMem = MemoryStream[(Long, Long, String)]
    val views = viewMem.toDF().toDF("view_id", "v_user", "vt")
      .withColumn("view_ts", to_timestamp(col("vt"))).drop("vt")
    val buys = buyMem.toDF().toDF("buy_id", "b_user", "bt")
      .withColumn("buy_ts", to_timestamp(col("bt"))).drop("bt")

    val joined = StreamJoin.intervalJoin(views, buys,
      "v_user", "b_user", "view_ts", "buy_ts",
      upper = "1 hour", watermark = "10 minutes")

    val q = joined.writeStream.format("memory").queryName("ssj_iv")
      .outputMode("append").start()
    viewMem.addData((1L, 7L, "2026-08-10 10:00:00"), (2L, 8L, "2026-08-10 10:00:00"))
    buyMem.addData(
      (100L, 7L, "2026-08-10 10:30:00"),  // in window, same user -> match
      (101L, 7L, "2026-08-10 11:00:00"),  // boundary: exactly +1h -> match
      (102L, 7L, "2026-08-10 11:00:01"),  // past upper -> no
      (103L, 7L, "2026-08-10 09:59:59"),  // before the view -> no
      (104L, 9L, "2026-08-10 10:30:00"))  // other user -> no
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj_iv").select("view_id", "buy_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (1L, 101L)))
  }

  test("runAvailableNow drives a file-source interval join to completion") {
    import org.apache.spark.sql.types._
    val raw = graft.Tables.eventsStream(spark, sf(), Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    val views = raw.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
    val buys = raw.where(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("b_user"), col("ts").as("buy_ts"))
    val got = StreamJoin.runAvailableNow(spark,
      StreamJoin.intervalJoin(views, buys, "v_user", "b_user", "view_ts", "buy_ts",
        upper = "24 hours", watermark = "1 hour"))

    // batch truth on the same file
    val ev = graft.Tables.load(spark, sf(), "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val bViews = ev.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
    val bBuys = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("b_user"), col("ts").as("buy_ts"))
    val want = bViews.join(bBuys,
      expr("v_user = b_user AND buy_ts >= view_ts AND buy_ts <= view_ts + INTERVAL 24 hours"))
      .select("view_id", "buy_id").as[(Long, Long)].collect().toSet

    assert(want.nonEmpty)
    assert(got.select("view_id", "buy_id").as[(Long, Long)].collect().toSet == want)
  }
}
