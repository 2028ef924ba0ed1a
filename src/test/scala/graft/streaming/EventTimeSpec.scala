package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Event-time windows + watermarks — the T4 gap the reference never
  * fills (it keys on calendar-day strings and merges in the store;
  * SURVEY §2.9). This is the real event-time surface: tumbling windows
  * with late-data tolerance bounded by the watermark.
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(3600000L + m * 60000L)

  test("windowed aggregation with watermark: in-window late data counted, too-late dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("window.start").as("w"), col("n"), col("s"))
    val q = agg.writeStream.format("memory").queryName("evt_win")
      .outputMode("append").start()

    // batch 1: events in windows [60,65) and [65,70); max ts = 69
    mem.addData((ts(60), 1.0), (ts(62), 2.0), (ts(66), 4.0), (ts(69), 8.0))
    q.processAllAvailable()
    // batch 2: advance event time to 100 => watermark becomes 90, the
    // first two windows close and emit
    mem.addData((ts(100), 16.0))
    q.processAllAvailable()
    // batch 3: an event 39 min behind the watermark — belongs to the
    // already-closed [60,65) window => dropped, no re-emission
    mem.addData((ts(61), 32.0))
    q.processAllAvailable()
    // batch 4: advance watermark past [100,105) so it emits too
    mem.addData((ts(120), 64.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("evt_win").collect()
      .map(r => ((r.getTimestamp(0).getTime - 3600000L) / 60000, r.getLong(1), r.getDouble(2))).toSet
    // [60,65): n=2 s=3 (late 32.0 dropped); [65,70): n=2 s=12; [100,105): n=1 s=16
    assert(rows == Set((60L, 2L, 3.0), (65L, 2L, 12.0), (100L, 1L, 16.0)), s"got $rows")
  }
}
