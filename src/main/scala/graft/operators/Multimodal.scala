package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analogue of mapInPandas). The decode step is a
  * deterministic STUB — the real image/audio libraries are not in this
  * container — but the schema, partitioning, batch shape, and the
  * partition-iterator pattern are the real, scale-tested plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("byte_len", LongType),
    StructField("mime", StringType),
    StructField("feature", ArrayType(DoubleType))))

  /** STUB decoder: a real implementation would decode the image/audio and
    * extract features; this one derives a deterministic 8-dim byte
    * histogram so the pipeline is testable end-to-end. Marked clearly as
    * the pluggable seam.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) >> 5) += 1.0
      i += 1
    }
    if (payload.length > 0) { var j = 0; while (j < 8) { hist(j) /= payload.length; j += 1 } }
    hist
  }

  /** Per-partition batched feature extraction over a media table
    * (media_id, payload binary, meta struct). Partition-iterator form:
    * one decoder init per partition (where a real impl would load a
    * model), streaming over rows — the mapInPandas batch shape.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .mapPartitions { rows =>
        // decoder/model init would happen here, once per partition
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val mime = if (r.isNullAt(2)) null else r.getString(2)
          Row(id, payload.length.toLong, mime, decodeStub(payload))
        }
      }(encoder)
  }

  /** Build a media table from the documents table (payload = utf-8 bytes
    * of text) — the offline stand-in for real binary media.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(lit("text/plain").as("mime"),
        col("n_chars").cast("int").as("width"),
        lit(1).as("height")).as("meta"))
}
