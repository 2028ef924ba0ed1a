package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** K5: the console debug sink (reference nytConsumer.py:64-69 — append
  * mode, periodic trigger). Last spec-less §2 row: drive it with a
  * real micro-batch run and pin (a) every input row flows through the
  * sink's progress, (b) the batch actually PRINTS (the sink's whole
  * point) — captured via Console.withOut, which the stream-execution
  * thread inherits because start() happens inside the scope.
  */
class ConsoleSinkSpec extends SparkSpec {

  test("console sink: append-mode micro-batches print and report progress") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, String)]
    mem.addData(("2026-01-01", "headline one"), ("2026-01-02", "headline two"))
    val buf = new java.io.ByteArrayOutputStream()
    val q = Console.withOut(new java.io.PrintStream(buf, true)) {
      val q = Ingest.startConsoleDebug(mem.toDF().toDF("Date", "Text"),
        Trigger.AvailableNow())
      assert(q.awaitTermination(60000), "stream did not drain in time")
      q
    }
    val printed = buf.toString
    assert(printed.contains("Batch: 0"), printed.take(500))
    assert(printed.contains("headline one") && printed.contains("headline two"),
      printed.take(500))
    assert(q.recentProgress.map(_.numInputRows).sum == 2L,
      q.recentProgress.mkString(";"))
    assert(q.recentProgress.head.sink.description.toLowerCase
      .contains("console"), q.recentProgress.head.sink.description)
  }
}
