package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table writer: pre-shuffles a table ONCE at write time so
  * every later equi-join / aggregation on the bucket key runs with no
  * exchange at all — the 100 TB answer to "this fact table joins on the
  * same key in every query". Two tables bucketed the same way co-locate
  * bucket-for-bucket; Spark's scan reports the bucket spec as its output
  * partitioning and the join planner drops both shuffles.
  */
object BucketedStore {

  /** Write `df` as a bucketed (and optionally sorted) table. With
    * `path` set the table is EXTERNAL (data at the explicit location,
    * independent of spark.sql.warehouse.dir / process cwd); otherwise
    * managed under the warehouse dir. Bucket count is a layout
    * decision: at scale, size buckets so one bucket of the biggest
    * table fits an executor core's working set.
    */
  def write(df: DataFrame, table: String, bucketCol: String, buckets: Int,
            sorted: Boolean = true, path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    val ws = if (sorted) w.sortBy(bucketCol) else w
    path.foreach(p => ws.option("path", p))
    ws.format("parquet").saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
