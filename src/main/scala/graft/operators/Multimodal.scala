package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analogue of mapInPandas). Two decoders ride the
  * same partition-iterator seam: `decodeStub` (a byte histogram — any
  * payload) and `decodePpm`, a REAL binary P6 image parse (header +
  * pixel plane), so the "binary in, decoded typed features out" claim
  * is exercised end-to-end on an actual image format. Heavier codecs
  * (JPEG/audio libs absent in this container) plug into the same seam.
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

  /** Render a deterministic binary P6 (raw RGB) PPM image for an id:
    * ASCII header `P6\n{w} {h}\n255\n` followed by w·h·3 pixel bytes,
    * byte i = (1103515245·(id + i) + 12345) mod 256 — plain integer
    * arithmetic (the LCG family the LSH planes use), so an oracle can
    * regenerate every pixel without parsing binary. The offline
    * stand-in for real image payloads; at scale this column arrives
    * from object storage, not a generator.
    */
  def syntheticPpm(id: Long, w: Int = 8, h: Int = 6): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h * 3) {
      out(header.length + i) = ((1103515245L * (id + i) + 12345L) % 256L).toByte
      i += 1
    }
    out
  }

  val ppmFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_px", LongType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** A real (if small) image decode: parse a binary P6 PPM — magic,
    * whitespace/`#`-comment-tolerant header ints (width, height,
    * maxval), single whitespace, then the raw RGB plane — and reduce it
    * to typed features (dimensions + per-channel means). Returns None
    * for anything that is not a complete 8-bit P6 stream (the
    * malformed-payload row, dropped by the caller — decode errors must
    * never kill a 100 TB scan).
    */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    var pos = 0
    def skipSpaceAndComments(): Unit = {
      var go = true
      while (go && pos < payload.length) {
        val c = payload(pos) & 0xFF
        if (c == '#') while (pos < payload.length && payload(pos) != '\n') pos += 1
        else if (Character.isWhitespace(c)) pos += 1
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipSpaceAndComments()
      val start = pos
      var v = 0L
      while (pos < payload.length && (payload(pos) & 0xFF).toChar.isDigit && v <= Int.MaxValue) {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      if (pos == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    pos = 2
    for {
      w <- readInt(); h <- readInt(); maxval <- readInt()
      if w > 0 && h > 0 && maxval == 255 // 8-bit only (maxval>255 = 2-byte samples)
      // plane size in Long: a malformed header like "50000 50000" would
      // overflow Int (w*h*3 < 0), slip past a length guard, and yield
      // garbage features instead of None
      need = w.toLong * h * 3
      if need <= Int.MaxValue
      if pos < payload.length && Character.isWhitespace(payload(pos) & 0xFF)
      if { pos += 1; (payload.length - pos).toLong >= need } // single ws, full plane
    } yield {
      val sums = new Array[Long](3)
      var i = 0
      val n = w * h * 3
      while (i < n) { sums(i % 3) += payload(pos + i) & 0xFF; i += 1 }
      val px = (w * h).toDouble
      (w, h, sums(0) / px, sums(1) / px, sums(2) / px)
    }
  }

  /** Batched P6 decode over a (media_id, payload) frame through the same
    * partition-iterator seam as extractFeatures: decoder state would
    * init once per partition; malformed payloads are dropped, not
    * thrown. Output: media_id, width, height, n_px, mean_r/g/b.
    */
  def ppmFeatures(media: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(ppmFeatureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          decodePpm(payload).map { case (w, h, mr, mg, mb) =>
            Row(id, w.toLong, h.toLong, (w * h).toLong, mr, mg, mb)
          }
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
