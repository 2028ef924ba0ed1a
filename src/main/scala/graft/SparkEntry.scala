package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator surface is assembled from the per-area query packs; each
  * query has a same-named entry in `oracleSql` unless its operator is not
  * SQL-expressible (hash signatures, the ARX solver), in which case the
  * driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The batch layer's J1 shape: two daily aggregates joined on date.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_join_daily")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.6). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ TextQueries.queries ++ VectorQueries.queries ++
      PipelineQueries.queries ++ ExtendedQueries.queries ++
      RelationalQueries.queries ++ CurationQueries.queries ++
      TimeSeriesQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ TextQueries.oracle ++ VectorQueries.oracle ++
      PipelineQueries.oracle ++ ExtendedQueries.oracle ++
      RelationalQueries.oracle ++ CurationQueries.oracle ++
      TimeSeriesQueries.oracle
}
