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

  /** Full P6 pixel plane (header-tolerant like [[decodePpm]]): None for
    * anything malformed. Values 0..255 as ints, raster order.
    */
  def decodePpmPixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var pos = 0
    def skip(): Unit = {
      var go = true
      while (go && pos < payload.length) {
        val c = payload(pos) & 0xFF
        if (c == '#') while (pos < payload.length && payload(pos) != '\n') pos += 1
        else if (Character.isWhitespace(c)) pos += 1
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skip()
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
      if w > 0 && h > 0 && maxval == 255
      need = w.toLong * h * 3
      if need <= Int.MaxValue
      if pos < payload.length && Character.isWhitespace(payload(pos) & 0xFF)
      if { pos += 1; (payload.length - pos).toLong >= need }
    } yield {
      val n = w * h * 3
      val px = new Array[Int](n)
      var i = 0
      while (i < n) { px(i) = payload(pos + i) & 0xFF; i += 1 }
      (w, h, px)
    }
  }

  val ppmTensorSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("c", LongType),
    StructField("x", LongType),
    StructField("y", LongType),
    StructField("v", LongType),
    StructField("v_norm", DoubleType)))

  /** Model-input tensor prep — center-crop to (cw × ch) and per-image
    * per-channel standardization ((v − mean)/√(var + eps)), the step
    * between decode and the model in every vision pipeline
    * (torchvision's CenterCrop + Normalize, here with image-derived
    * moments so the contract is self-contained). Same batched
    * partition-iterator seam as [[ppmFeatures]]; images smaller than
    * the crop are dropped, not padded. Moments come from EXACT integer
    * sums over the crop (sum, sum-of-squares), so every emitted double
    * is a pure function of integers both engines replay bit-for-bit.
    * Output: one row per (media_id, channel, x, y) of the crop.
    */
  def ppmCropNormalize(media: DataFrame, cw: Int, ch: Int,
                       eps: Double = 1e-5): DataFrame = {
    require(cw >= 1 && ch >= 1, s"bad crop ($cw, $ch)")
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(ppmTensorSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          decodePpmPixels(payload).toSeq.flatMap { case (w, h, px) =>
            if (w < cw || h < ch) Seq.empty
            else {
              val x0 = (w - cw) / 2
              val y0 = (h - ch) / 2
              val npx = (cw * ch).toDouble
              val out = Seq.newBuilder[Row]
              var c = 0
              while (c < 3) {
                var sum = 0L
                var sq = 0L
                var y = 0
                while (y < ch) {
                  var x = 0
                  while (x < cw) {
                    val v = px(3 * ((y0 + y) * w + (x0 + x)) + c)
                    sum += v; sq += v.toLong * v; x += 1
                  }
                  y += 1
                }
                val mean = sum.toDouble / npx
                val denom = math.sqrt(sq.toDouble / npx - mean * mean + eps)
                var y2 = 0
                while (y2 < ch) {
                  var x2 = 0
                  while (x2 < cw) {
                    val v = px(3 * ((y0 + y2) * w + (x0 + x2)) + c)
                    out += Row(id, c.toLong, x2.toLong, y2.toLong, v.toLong,
                      (v.toDouble - mean) / denom)
                    x2 += 1
                  }
                  y2 += 1
                }
                c += 1
              }
              out.result()
            }
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

  /** Perturbed synthetic P6: [[syntheticPpm]] of `baseId` with ONE
    * plane byte overridden as a function of `id` — a corpus of image
    * groups that are perceptual near-duplicates (same base plane, tiny
    * per-copy edit) without being byte-identical. The near-dup-media
    * test fixture; every byte is regenerable arithmetically.
    */
  def syntheticPpmVariant(id: Long, baseId: Long, w: Int = 8, h: Int = 6): Array[Byte] = {
    val out = syntheticPpm(baseId, w, h)
    val plane = w * h * 3
    val header = out.length - plane
    out(header + (id % plane).toInt) = ((id * 7) % 256L).toByte
    out
  }

  /** Average-hash (aHash) perceptual image signature over the decoded
    * P6 plane: per-pixel gray = r+g+b (the monotone-equivalent of the
    * mean — no division), bit_i = [gray_i · n_px > Σgray] (exact
    * integer compare, no float mean), packed little-endian into a
    * long. w·h must be <= 64. Runs inside the same partition-iterator
    * decode seam as [[ppmFeatures]]; malformed payloads are dropped.
    * Output: (media_id, phash, n_px).
    */
  def aHashes(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("phash", LongType),
      StructField("n_px", LongType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          aHashOf(payload).map { case (hash, n) => Row(id, hash, n) }
        }
      }(encoder)
  }

  /** [[aHashes]] with a TWO-long row key (media_id, frame_idx) carried
    * through the decode seam unchanged — the per-frame form
    * [[Media.keyframes]] needs. Carrying the pair as two columns
    * (instead of bit-packing frame_idx into media_id's low bits)
    * keeps both id ranges unbounded: the packed form silently merged
    * hash streams for media_id >= 2^43 or frame_idx >= 2^20.
    * Output: (media_id, frame_idx, phash, n_px).
    */
  def aHashesKeyed(frames: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", LongType),
      StructField("phash", LongType),
      StructField("n_px", LongType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    frames.select(col("media_id").cast("long"),
        col("frame_idx").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val fi = r.getLong(1)
          val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          aHashOf(payload).map { case (hash, n) => Row(id, fi, hash, n) }
        }
      }(encoder)
  }

  /** The aHash kernel shared by [[aHashes]]/[[aHashesKeyed]]:
    * (phash, n_px) of one payload, None on malformed input.
    */
  private def aHashOf(payload: Array[Byte]): Option[(Long, Long)] =
    decodePpmGray(payload).map { grays =>
      val n = grays.length
      var total = 0L
      var i = 0
      while (i < n) { total += grays(i); i += 1 }
      var hash = 0L
      i = 0
      while (i < n) {
        if (grays(i).toLong * n > total) hash |= (1L << i)
        i += 1
      }
      (hash, n.toLong)
    }

  /** Validate via [[decodePpm]], then locate the pixel plane with the
    * same walk (three header ints + one whitespace byte) — robust to
    * comments and trailing bytes; no size limit (callers impose their
    * own). @return (width, height, plane offset)
    */
  private[operators] def decodePpmPlane(payload: Array[Byte]): Option[(Int, Int, Int)] =
    decodePpm(payload).map { case (w, h, _, _, _) =>
      var pos = 2
      var ints = 0
      while (ints < 3) {
        while (Character.isWhitespace(payload(pos) & 0xFF) ||
          (payload(pos) & 0xFF) == '#') {
          if ((payload(pos) & 0xFF) == '#')
            while (payload(pos) != '\n') pos += 1
          else pos += 1
        }
        while (pos < payload.length && (payload(pos) & 0xFF).toChar.isDigit) pos += 1
        ints += 1
      }
      (w, h, pos + 1) // the single whitespace after maxval
    }

  /** Per-pixel gray plane (r+g+b) of a P6 payload, None if malformed
    * or larger than 64 pixels (aHash packs into one long).
    */
  private[operators] def decodePpmGray(payload: Array[Byte]): Option[Array[Int]] =
    decodePpmPlane(payload).flatMap { case (w, h, pos) =>
      if (w * h > 64) None
      else {
        val n = w * h
        val grays = new Array[Int](n)
        var i = 0
        while (i < n) {
          grays(i) = (payload(pos + 3 * i) & 0xFF) +
            (payload(pos + 3 * i + 1) & 0xFF) +
            (payload(pos + 3 * i + 2) & 0xFF)
          i += 1
        }
        Some(grays)
      }
    }

  private val ppmPatchSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("media_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("prow",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("pcol",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_px",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("mean_r",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("mean_g",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("mean_b",
      org.apache.spark.sql.types.DoubleType)))

  /** ViT-style patch extraction: split each decoded P6 plane into a
    * grid of `pw`×`ph`-pixel patches and emit one row per patch with
    * its grid position and per-channel means — the image→token-grid
    * preprocessing step of a vision-model data pipeline, in the same
    * batched partition-iterator seam as [[ppmFeatures]] (a real
    * decoder/featurizer drops into the same shape). Images whose
    * dimensions don't divide evenly are out of contract and skipped
    * (resize first — [[Media.resizePpm]]); integer channel sums make
    * the means exact IEEE divisions an oracle replays.
    */
  def ppmPatches(media: DataFrame, pw: Int, ph: Int): DataFrame = {
    require(pw >= 1 && ph >= 1, s"bad patch size ${pw}x$ph")
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(ppmPatchSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          decodePpmPlane(payload).toSeq.flatMap { case (w, h, pos) =>
            if (w % pw != 0 || h % ph != 0) Seq.empty
            else for {
              prow <- 0 until h / ph
              pcol <- 0 until w / pw
            } yield {
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = prow * ph
              while (y < (prow + 1) * ph) {
                var x = pcol * pw
                while (x < (pcol + 1) * pw) {
                  val p = pos + 3 * (y * w + x)
                  sr += payload(p) & 0xFF
                  sg += payload(p + 1) & 0xFF
                  sb += payload(p + 2) & 0xFF
                  x += 1
                }
                y += 1
              }
              val n = pw * ph
              Row(id, prow.toLong, pcol.toLong, n.toLong,
                sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
            }
          }
        }
      }(encoder)
  }

  /** Near-duplicate media pairs by banded aHash: split each signature
    * into `bands` contiguous bit ranges, equi-join on (band, bits),
    * verify candidates at Hamming distance <= `maxHam`. Completeness
    * is the pigeonhole, not a probabilistic LSH bound: any pair within
    * `maxHam < bands` bit flips shares at least one intact band, so
    * the candidate stage misses nothing it claims to find — and it is
    * an equi-join on band bits, never an all-pairs scan. `bitsTotal`
    * is the signature width (n_px of the fixture's 8x6 planes = 48).
    */
  def perceptualNearDupPairs(hashes: DataFrame, bitsTotal: Int = 48,
                             bands: Int = 4, maxHam: Int = 3): DataFrame = {
    require(bands > maxHam, s"pigeonhole needs bands > maxHam")
    require(bitsTotal % bands == 0)
    val bw = bitsTotal / bands
    val mask = (1L << bw) - 1L
    val banded = hashes.select(col("media_id"), col("phash"),
      explode(expr(
        s"transform(sequence(0, ${bands - 1})," +
          s" b -> struct(b AS band, shiftright(phash, b * $bw) & $mask AS bits))"))
        .as("bb"))
      .select(col("media_id"), col("phash"), col("bb.band"), col("bb.bits"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("ham"))
      .distinct()
      .where(col("ham") <= maxHam)
  }
}
