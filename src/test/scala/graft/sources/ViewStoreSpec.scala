package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** K1-K4 view semantics: append, overwrite, dynamic-partition merge,
  * and the K4 read side (append + same key => last-write-wins per key).
  */
class ViewStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val store =
    new ViewStore(spark, Files.createTempDirectory("graft_vs_").toString)

  test("K4: append + latestPerKey resolves last-write-wins") {
    store.append("serving_t", Seq(("2026-08-10", 1L, 100.0)).toDF("Date", "seq", "pred"), "Date")
    store.append("serving_t", Seq(("2026-08-10", 2L, 101.5), ("2026-08-11", 1L, 99.0))
      .toDF("Date", "seq", "pred"), "Date")
    assert(store.read("serving_t").count() == 3) // raw append keeps history
    val latest = store.latestPerKey("serving_t", "Date", "seq")
      .select("Date", "pred").as[(String, Double)].collect().toMap
    assert(latest == Map("2026-08-10" -> 101.5, "2026-08-11" -> 99.0))
  }

  test("K2 merge replaces only touched partitions") {
    store.merge("speed_t", Seq(("2026-08-10", 1.0), ("2026-08-11", 2.0)).toDF("Date", "v"), "Date")
    store.merge("speed_t", Seq(("2026-08-11", 20.0)).toDF("Date", "v"), "Date")
    val got = store.read("speed_t").as[(Double, String)].collect().toMap.map(_.swap)
    assert(got == Map("2026-08-10" -> 1.0, "2026-08-11" -> 20.0))
  }

  test("K3 overwrite rewrites the whole view") {
    store.overwrite("batch_t", Seq(("2026-08-10", 1.0)).toDF("Date", "v"), "Date")
    store.overwrite("batch_t", Seq(("2026-08-12", 3.0)).toDF("Date", "v"), "Date")
    assert(store.read("batch_t").select("Date").as[String].collect().toSeq == Seq("2026-08-12"))
  }

  test("S3 range scan partition-prunes") {
    store.overwrite("pruned_t",
      (1 to 9).map(i => (f"2026-08-0$i", i.toDouble)).toDF("Date", "v"), "Date")
    val scan = store.rangeScan("pruned_t", "Date", "2026-08-03", "2026-08-05")
    assert(scan.count() == 3)
    // pruning visible in the plan: partition filters on Date
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("Date"), plan)
  }
}
