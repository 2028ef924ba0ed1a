package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed keyed view tables replacing the reference's
  * Elasticsearch indexes (SURVEY §1.4, §2.2). Views are partitioned by
  * the key column (`Date` in the pipeline) so range scans
  * partition-prune — the Catalyst-native replacement for the
  * reference's server-side `es.query` range pushdown
  * (prediction.py:37-47).
  *
  * Write semantics map the four reference sinks:
  *   - overwrite  -> K3 (batch_view daily recompute)
  *   - append     -> K1 (master append; id-less)
  *   - appendKeyed-> K4 (append + last-write-wins per key on read)
  *   - merge      -> K2 (upsert: replace only the touched partitions) —
  *     idempotent under micro-batch replay, the exactly-once half of
  *     at-least-once delivery + idempotent sink (SURVEY §2.9 T6)
  */
class ViewStore(spark: SparkSession, root: String) {

  private def path(view: String) = s"$root/$view"

  /** Cluster rows by the partition column before a partitionBy write —
    * Iceberg's `write.distribution-mode=hash` (guide §6): without it
    * every input partition opens a file in every key directory
    * (input-width × key-count small files; a wide upstream compute
    * stage multiplies the store's file count), with it each key
    * directory gets its hash bucket's single file whatever the
    * upstream width. The shuffle moves exactly the written bytes once.
    */
  private def clustered(df: DataFrame, keyCol: String): DataFrame =
    df.repartition(col(keyCol))

  /** K3: full rewrite, partitioned by key. */
  def overwrite(view: String, df: DataFrame, keyCol: String): Unit =
    clustered(df, keyCol).write.mode(SaveMode.Overwrite)
      .partitionBy(keyCol).parquet(path(view))

  /** K1: append-only master (no key identity). */
  def append(view: String, df: DataFrame, keyCol: String): Unit =
    clustered(df, keyCol).write.mode(SaveMode.Append)
      .partitionBy(keyCol).parquet(path(view))

  /** K2: upsert — replace only the key partitions present in `df`
    * (dynamic partition overwrite: no other partition is touched, so
    * concurrent days don't clobber each other and replays are
    * idempotent).
    */
  def merge(view: String, df: DataFrame, keyCol: String): Unit =
    clustered(df, keyCol).write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(keyCol)
      .parquet(path(view))

  /** Read a view; `dedupKeyed` resolves K4 append+same-id semantics to
    * last-write-wins per key via a seq column.
    */
  def read(view: String): DataFrame = spark.read.parquet(path(view))

  /** S3: range scan with partition pruning on the key. */
  def rangeScan(view: String, keyCol: String, lo: String, hi: String): DataFrame =
    read(view).where(col(keyCol).between(lo, hi))

  /** K4 read side: latest row per key by `seqCol`. */
  def latestPerKey(view: String, keyCol: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    read(view).withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }
}
