package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** T2 variant: update output mode — each micro-batch re-emits the
  * changed aggregate rows instead of waiting for the watermark to close
  * the window (the low-latency serving shape).
  */
class UpdateModeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(3600000L + m * 60000L)

  test("update mode re-emits revised window aggregates per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val q = mem.toDF().toDF("ts", "v")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("window.start").as("w"), col("n"), col("s"))
      .writeStream.format("memory").queryName("upd_t")
      .outputMode("update").start()

    mem.addData((ts(0), 1.0))
    q.processAllAvailable()
    mem.addData((ts(1), 2.0)) // same window: revised row emitted
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("upd_t").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toList.sorted
    // batch1 emits (1, 1.0); batch2 re-emits the window as (2, 3.0)
    assert(rows == List((1L, 1.0), (2L, 3.0)), s"got $rows")
  }
}
