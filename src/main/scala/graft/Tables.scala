package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** events.ts has shipped in three physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) (Spark reads it as long
    * nanos under `nanosAsLong` — truncate to micros, the same
    * truncation DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP),
    * plain micros TIMESTAMP_NTZ (current generation), or an
    * already-session-TZ TIMESTAMP. Normalize ALL of them to
    * TimestampType: the session runs in UTC, so the NTZ wall-clock
    * reinterpretation is value-identical to the old nanos path and
    * every downstream event-time operator keeps seeing one type.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** The events table's on-disk ts type (footer reads only) — the
    * streaming reader needs the PHYSICAL type in its fixed schema;
    * guessing LongType against a micros file fails analysis, and
    * vice versa.
    *
    * The probe scans the SAME glob [[eventsStream]] reads (a
    * single-file probe could pass while the glob holds files from a
    * different generation) with `mergeSchema` on, so a directory
    * mixing physical ts types fails HERE with a schema-merge error
    * instead of mis-reading at stream time. The legacy nanosAsLong
    * conf is needed only while nanos-generation files exist: it is
    * restored when the probe finds a non-nanos generation, so the
    * session-global flag isn't left flipped by a mere probe.
    */
  def eventsTsType(spark: SparkSession, dir: String): DataType = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    // restore on EVERY exit that doesn't need the flag — including the
    // mixed-generation schema-merge failure, which would otherwise
    // leave the session-global flag flipped by a mere probe
    val t =
      try spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/events.parque*").schema("ts").dataType
      catch { case e: Throwable => restore(spark, key, prev); throw e }
    if (t != LongType) restore(spark, key, prev)
    t
  }

  private def restore(spark: SparkSession, key: String,
                      prev: Option[String]): Unit = prev match {
    case Some(v) => spark.conf.set(key, v)
    case None => spark.conf.unset(key)
  }

  /** Streaming scan of the events table projected to `fields`, with
    * `ts` (when requested) normalized to TimestampType whatever the
    * file's generation. The footer probe runs once, before the stream
    * starts — the schema is then fixed for the query's lifetime, as
    * Structured Streaming requires.
    */
  def eventsStream(spark: SparkSession, dir: String,
                   fields: Seq[StructField]): DataFrame = {
    val onDisk = eventsTsType(spark, dir)
    val schema = StructType(fields.map(f =>
      if (f.name == "ts") f.copy(dataType = onDisk) else f))
    normalizeTs(spark.readStream.schema(schema).parquet(s"$dir/events.parque*"))
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }
}
