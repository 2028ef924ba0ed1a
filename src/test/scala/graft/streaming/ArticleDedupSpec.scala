package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** F4 streaming form: dedup-by-Id holds state across micro-batches —
  * a re-delivered article id is suppressed even when it arrives in a
  * later batch (the reference only dedups consecutive ids at the
  * producer; engine-side keyed state is strictly stronger).
  */
class ArticleDedupSpec extends SparkSpec {
  import spark.implicits._

  private def art(id: String, d: String) =
    s"""{"Id":"$id","Date":"$d","text":"body of article $id"}"""

  test("dropDuplicates(Id) suppresses re-delivery across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = SpeedLayer.parseArticles(mem.toDF())
      .writeStream.format("memory").queryName("articles_t")
      .outputMode("append").start()

    mem.addData(art("a1", "2026-08-10"), art("a1", "2026-08-10"), art("a2", "2026-08-10"))
    q.processAllAvailable()
    mem.addData(art("a1", "2026-08-11"), art("a3", "2026-08-11")) // a1 replayed later
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("articles_t").select("Id").as[String].collect().sorted
    assert(ids.toSeq == Seq("a1", "a2", "a3"))
  }
}
