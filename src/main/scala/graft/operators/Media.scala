package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio/video media operators over opaque `binary` columns, riding the
  * same partition-iterator decode seam as [[Multimodal]] (one decoder
  * init per partition, malformed payloads dropped — a decode error must
  * never kill a 100 TB scan). Two REAL binary parsers:
  *
  *  - audio: RIFF/WAVE chunk walk → PCM16LE mono samples
  *    (ref fixtures would arrive as object-store blobs; the reference
  *    pipeline treats media as opaque rows the same way —
  *    `/root/reference/batchPipeline.py` keeps payload columns opaque
  *    until a UDF stage needs them)
  *  - video: a length-prefixed frame container → per-frame P6 images,
  *    reusing [[Multimodal.decodePpm]] for the frame plane
  *
  * Fixtures are arithmetic (LCG samples/pixels), so every byte is
  * replayable by an oracle WITHOUT a binary parser — while the Spark
  * side exercises the real decode path. Heavier codecs (MP3/H.264 libs
  * absent in this container) plug into the same seam.
  */
object Media {

  // ------------------------------------------------------------- audio

  /** Deterministic RIFF/WAVE PCM16LE mono fixture: a REAL 44-byte WAV
    * (RIFF size, fmt chunk: PCM, 1 channel, 16-bit, `rate` Hz, correct
    * byteRate/blockAlign, data chunk) whose samples are pure integer
    * arithmetic. With `lcg = (1103515245·(id·1000 + i) + 12345) mod 2³¹`
    * (non-negative):
    *
    *  - frames `(i / 16) % 4 == 0` are QUIET: `s = lcg % 64 − 32`
    *  - all other frames are LOUD: `s = lcg % 65536 − 32768`
    *
    * so every 4th 16-sample frame is near-silence — the fixture for
    * energy gating. An oracle regenerates every sample from the id.
    */
  def syntheticWav(id: Long, nSamples: Int = 128, rate: Int = 8000): Array[Byte] = {
    val data = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)          // PCM, mono
      .putInt(rate).putInt(rate * 2)    // byteRate = rate · blockAlign
      .putShort(2).putShort(16)         // blockAlign, bits
    buf.put("data".getBytes("US-ASCII")).putInt(data)
    var i = 0
    while (i < nSamples) {
      val lcg = (1103515245L * (id * 1000 + i) + 12345L) % 2147483648L
      val s = if ((i / 16) % 4 == 0) (lcg % 64 - 32).toShort
              else (lcg % 65536 - 32768).toShort
      buf.putShort(s)
      i += 1
    }
    buf.array()
  }

  /** Real WAV decode: validate RIFF/WAVE magic, walk chunks (any order,
    * word-aligned sizes per spec), require PCM16 mono from `fmt `, read
    * PCM16LE samples from `data`. None for anything else — the
    * malformed-payload row, dropped by callers.
    */
  def decodeWav(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    def ascii(at: Int, n: Int) = new String(payload, at, n, "US-ASCII")
    def u16(at: Int) = (payload(at) & 0xFF) | ((payload(at + 1) & 0xFF) << 8)
    def i32(at: Int) = (payload(at) & 0xFF) | ((payload(at + 1) & 0xFF) << 8) |
      ((payload(at + 2) & 0xFF) << 16) | ((payload(at + 3) & 0xFF) << 24)
    if (payload.length < 44 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
      return None
    var pos = 12
    var fmtOk = false
    var rate = 0
    var samples: Array[Short] = null
    while (pos + 8 <= payload.length) {
      val tag = ascii(pos, 4)
      val size = i32(pos + 4)
      if (size < 0 || pos + 8 + size > payload.length) return None
      tag match {
        case "fmt " if size >= 16 =>
          fmtOk = u16(pos + 8) == 1 && u16(pos + 10) == 1 && u16(pos + 22) == 16
          rate = i32(pos + 12)
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = ((payload(pos + 8 + 2 * i) & 0xFF) |
              (payload(pos + 8 + 2 * i + 1) << 8)).toShort
            i += 1
          }
        case _ => () // skip unknown chunks (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (fmtOk && samples != null) Some((rate, samples)) else None
  }

  /** Per-frame audio features through the batched decode seam: fixed
    * `frameLen`-sample framing (tail partial frame dropped), per frame
    * `energy = Σ|s|` and `peak = max|s|` (exact integers), and
    * `zcr` = sign changes between adjacent samples (`s·s_prev < 0`).
    * `is_active = energy > gate·frameLen` — the silence gate a
    * speech-data pipeline trims on. Output: (media_id, frame_idx,
    * energy, zcr, peak, is_active), all exact — an oracle replays the
    * arithmetic from the samples.
    */
  def wavFrameFeatures(media: DataFrame, frameLen: Int = 16,
                       gate: Long = 64L): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", LongType),
      StructField("energy", LongType),
      StructField("zcr", LongType),
      StructField("peak", LongType),
      StructField("is_active", BooleanType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          decodeWav(payload).iterator.flatMap { case (_, s) =>
            (0 until s.length / frameLen).iterator.map { f =>
              var energy = 0L; var zcr = 0L; var peak = 0L
              var i = f * frameLen
              val end = i + frameLen
              while (i < end) {
                val v = s(i).toLong
                energy += math.abs(v)
                if (math.abs(v) > peak) peak = math.abs(v)
                if (i > f * frameLen && v * s(i - 1).toLong < 0) zcr += 1
                i += 1
              }
              Row(id, f.toLong, energy, zcr, peak, energy > gate * frameLen)
            }
          }
        }
      }(encoder)
  }

  /** Active-span trim over [[wavFrameFeatures]] output: per media, the
    * first/last active frame and the total active energy — the
    * "trim leading/trailing silence" reduction. Pure declarative agg
    * (one map-side-combined groupBy), media with NO active frame get
    * NULL bounds (kept: the caller decides whether to drop all-silence
    * rows).
    */
  def activeSpans(frames: DataFrame): DataFrame =
    frames.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        min(when(col("is_active"), col("frame_idx"))).as("active_start"),
        max(when(col("is_active"), col("frame_idx"))).as("active_end"),
        sum(when(col("is_active"), col("energy")).otherwise(0L)).as("active_energy"))

  // ------------------------------------------------------------- video

  /** Deterministic video fixture: magic "VID0", big-endian frame count,
    * then per frame a big-endian length prefix + a REAL P6 payload.
    * Frame `f` belongs to scene `f / 4`; its plane is
    * [[Multimodal.syntheticPpmVariant]](id·1000 + f, id·64 + f/4) —
    * frames within a scene share a base plane and differ by one byte
    * (near-identical), scene changes swap the whole plane. The
    * shot-boundary fixture; every pixel replays arithmetically.
    */
  def syntheticVideo(id: Long, nFrames: Int = 16, w: Int = 8, h: Int = 6): Array[Byte] = {
    val frames = (0 until nFrames).map(f =>
      Multimodal.syntheticPpmVariant(id * 1000 + f, id * 64 + f / 4, w, h))
    val buf = java.nio.ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
    buf.put("VID0".getBytes("US-ASCII")).putInt(nFrames)
    frames.foreach(fr => { buf.putInt(fr.length); buf.put(fr) })
    buf.array()
  }

  /** Frame-sample: parse the container and emit every `stride`-th frame
    * as its own (media_id, frame_idx, payload) row — the decode-and-
    * sample step a video training pipeline runs before per-frame
    * feature extraction. Real binary walk (magic, counts, length
    * prefixes; truncated containers dropped), partition-iterator seam,
    * and the UNSAMPLED frames are never materialized as rows.
    */
  def videoFrames(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1)
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          def i32(at: Int) = (p(at) & 0xFF) << 24 | (p(at + 1) & 0xFF) << 16 |
            (p(at + 2) & 0xFF) << 8 | (p(at + 3) & 0xFF)
          if (p.length < 8 || new String(p, 0, 4, "US-ASCII") != "VID0") Iterator.empty
          else {
            val n = i32(4)
            var pos = 8
            var f = 0
            var bad = false
            val out = Vector.newBuilder[Row]
            while (f < n && !bad) {
              if (pos + 4 > p.length) bad = true
              else {
                val len = i32(pos)
                if (len < 0 || pos + 4 + len > p.length) bad = true
                else {
                  if (f % stride == 0)
                    out += Row(id, f.toLong, java.util.Arrays.copyOfRange(p, pos + 4, pos + 4 + len))
                  pos += 4 + len
                  f += 1
                }
              }
            }
            if (bad) Iterator.empty else out.result().iterator
          }
        }
      }(encoder)
  }

  /** Shot-boundary detection over sampled frames: per-frame perceptual
    * hash ([[Multimodal.aHashesKeyed]] on the frame plane), then a frame is
    * a KEYFRAME iff it is the first sampled frame or its hash is more
    * than `hamThresh` bits from the previous SAMPLED frame's. One
    * window over (media, frame order) — no self-join; at 100 TB the
    * per-media frame sequence is a few thousand rows, and the window
    * partitions by media_id so no global sort exists.
    */
  def keyframes(frames: DataFrame, hamThresh: Int = 2): DataFrame = {
    val hashed = Multimodal.aHashesKeyed(
        frames.select(col("media_id"), col("frame_idx"), col("payload")))
      .select(col("media_id"), col("frame_idx"), col("phash"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    hashed.withColumn("_prev", lag(col("phash"), 1).over(w))
      .withColumn("is_key", col("_prev").isNull ||
        bit_count(col("phash").bitwiseXOR(col("_prev"))) > hamThresh)
      .select(col("media_id"), col("frame_idx"), col("phash"), col("is_key"))
  }

  // ------------------------------------------------------------- image

  /** Nearest-neighbor integer-factor downsample of a P6 payload:
    * out(x, y) = in(x·factor, y·factor), re-emitted as a REAL P6 stream
    * (so resized frames flow back through every PPM operator). None on
    * malformed input or when factor does not divide the dimensions.
    */
  def ppmResize(payload: Array[Byte], factor: Int): Option[Array[Byte]] =
    Multimodal.decodePpm(payload).flatMap { case (w, h, _, _, _) =>
      if (factor < 1 || w % factor != 0 || h % factor != 0) None
      else {
        // locate the plane: header = total − w·h·3 cannot be used (the
        // payload may carry trailing bytes); rewalk the three header
        // ints exactly as decodePpm validated them
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
        pos += 1
        val (ow, oh) = (w / factor, h / factor)
        val header = s"P6\n$ow $oh\n255\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + ow * oh * 3)
        System.arraycopy(header, 0, out, 0, header.length)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val src = pos + 3 * ((y * factor) * w + x * factor)
            val dst = header.length + 3 * (y * ow + x)
            out(dst) = payload(src); out(dst + 1) = payload(src + 1)
            out(dst + 2) = payload(src + 2)
            x += 1
          }
          y += 1
        }
        Some(out)
      }
    }

  /** Batched resize over a (media_id, payload) frame — same seam, same
    * drop-on-malformed policy; output payloads are valid P6 streams.
    */
  def resizePpm(media: DataFrame, factor: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          ppmResize(p, factor).map(Row(id, _))
        }
      }(encoder)
  }
}
