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
}
