package graft

import org.apache.spark.sql.SparkSession

/** Dev aid: time a comma-separated list of queries at a given sfDir
  * (args: sfDir q1,q2,... [nRuns]) — the per-query iteration loop the
  * full Bench round-robin is too slow for.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val nRuns = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tuning.install(spark)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warm codegen at the smallest sf
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val ts = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $name min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
