package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** CmsEstimate (the probe half of count_min_sketch) against the JVM
  * sketch API it wraps, plus the CMS no-undercount invariant.
  */
class CmsEstimateSpec extends SparkSpec {
  import spark.implicits._

  test("estimates equal CountMinSketch.estimateCount for the same build") {
    val items = (1L to 500L).map(i => i % 37)
    val viaSql = items.toDF("x")
      .agg(expr("count_min_sketch(x, 0.01d, 0.95d, 7)").as("sk"))
      .select(explode(typedlit((0L until 37L).toSeq)).as("probe"), col("sk"))
      .select(col("probe"), CmsEstimate(col("sk"), col("probe")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = CountMinSketch.create(0.01, 0.95, 7)
    items.foreach(ref.add)
    for (p <- 0L until 37L) {
      assert(viaSql(p) == ref.estimateCount(p), s"probe $p")
      val exact = items.count(_ == p)
      assert(viaSql(p) >= exact, s"CMS undercounted probe $p")
    }
  }

  test("garbage binary fails with a clear message") {
    val ex = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("sk")
        .select(CmsEstimate(col("sk"), lit(1L))).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(chain(ex).exists(m => m != null && m.contains("cms_estimate")), chain(ex).toString)
  }
}
