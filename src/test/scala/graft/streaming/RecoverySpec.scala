package graft.streaming

import graft.SparkSpec
import graft.sources.ViewStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** T3/T6: checkpoint recovery of the speed layer — the production
  * topology (two ingest streams unioned into one stateful merge) stopped
  * and restarted from its checkpoint; the EW state and view must
  * continue exactly, not restart from scratch.
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("speed layer resumes EW state and view from checkpoint after restart") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_recovery_").toString
    val store = new ViewStore(spark, root)
    val cp = s"$root/_cp"

    val stockMem = MemoryStream[String]
    val newsMem = MemoryStream[(String, Long, Double, Double, Double)]

    def pipeline() = {
      implicit val s = spark
      val ticks = SpeedLayer.stockDeltas(SpeedLayer.parseStock(stockMem.toDF()))
      val sents = SpeedLayer.newsDeltas(
        newsMem.toDF().toDF("Date", "seq", "Positive", "Negative", "Neutre"))
      SpeedLayer.mergeDeltas(ticks.union(sents)).toDF()
    }

    def stock(d: String, c: Double) =
      s"""{"Date":"$d","Open":"1","High":"2","Low":"0","Close":"$c","Volume":"10"}"""

    // run 1: one tick + two sentiment docs for the day
    stockMem.addData(stock("2026-08-10", 50.0))
    newsMem.addData(("2026-08-10", 1L, 0.8, 0.1, 0.1), ("2026-08-10", 2L, 0.4, 0.3, 0.3))
    val q1 = Ingest.startSpeedView(pipeline(), store, "speed_view", cp,
      trigger = Trigger.AvailableNow())
    q1.awaitTermination()

    val mid = store.read("speed_view").where(col("date") === "2026-08-10").collect().head
    assert(mid.getAs[Long]("nbrArticle") == 2L)
    assert(mid.getAs[Double]("positive") == (0.8 + 0.4) / 2.0)

    // run 2 (restart from checkpoint): a third doc must fold onto the
    // RECOVERED state (0.6), not restart the average
    newsMem.addData(("2026-08-10", 3L, 0.2, 0.4, 0.4))
    stockMem.addData(stock("2026-08-10", 55.0)) // last-write-wins close
    val q2 = Ingest.startSpeedView(pipeline(), store, "speed_view", cp,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()

    val fin = store.read("speed_view").where(col("date") === "2026-08-10").collect().head
    assert(fin.getAs[Long]("nbrArticle") == 3L)
    assert(fin.getAs[Double]("positive") == (((0.8 + 0.4) / 2.0) + 0.2) / 2.0)
    assert(fin.getAs[Double]("close") == 55.0)
  }
}
