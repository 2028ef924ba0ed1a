package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; here they
  * are plain parquet files, one per table, read with the vectorized parquet
  * reader. All scans go through `load` so predicate pushdown / column
  * pruning semantics are uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts is parquet TIMESTAMP(NANOS) which the Spark reader
      // rejects; read nanos as long and truncate to microseconds (same
      // truncation DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }
}
