package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source seam for the ingest streams (SURVEY §2.1 S1, §7.5): the
  * pipeline consumes a raw `value`-column streaming DataFrame; where the
  * bytes come from is one implementation behind this trait. Offline
  * tests use MemoryStream directly or FileStreamSource; the Kafka path
  * is the same reader options the reference uses, one jar away.
  */
trait StreamSource {
  /** A streaming DataFrame with at least a `value` column (string or
    * binary), Kafka-shaped.
    */
  def load(spark: SparkSession): DataFrame
}

/** File-based source: each line of a text file is one record's value —
  * the offline stand-in for a topic.
  */
class FileStreamSource(path: String) extends StreamSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream.format("text").load(path)
}

/** Kafka source with the reference's exact options (yfConsumer.py:26-33:
  * subscribe one topic, tolerate data loss). The kafka connector jar is
  * not present in the offline image, so this class is compile-checked
  * here and exercised only where the jar exists.
  */
class KafkaStreamSource(bootstrap: String, topic: String) extends StreamSource {

  /** The reader options, exposed for tests: the reference's consumer
    * config (one subscribed topic, loss-tolerant) verbatim.
    */
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "failOnDataLoss" -> "false")

  override def load(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka").options(options).load()
}
