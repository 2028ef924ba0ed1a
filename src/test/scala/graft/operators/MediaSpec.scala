package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def sample(id: Long, i: Int): Long = {
    val lcg = (1103515245L * (id * 1000 + i) + 12345L) % 2147483648L
    if ((i / 16) % 4 == 0) lcg % 64 - 32 else lcg % 65536 - 32768
  }

  test("decodeWav round-trips the synthetic fixture; rejects junk") {
    val wav = Media.syntheticWav(3L, nSamples = 64, rate = 16000)
    val Some((rate, s)) = Media.decodeWav(wav)
    assert(rate == 16000 && s.length == 64)
    (0 until 64).foreach(i => assert(s(i).toLong == sample(3L, i), s"i=$i"))
    assert(Media.decodeWav("RIFFjunk".getBytes("US-ASCII")).isEmpty)
    assert(Media.decodeWav(Array.empty[Byte]).isEmpty)
    // truncated data chunk: header claims more than the payload holds
    assert(Media.decodeWav(wav.take(wav.length - 10)).isEmpty)
  }

  test("decodeWav walks unknown chunks and word-aligned sizes") {
    // splice a 3-byte (odd) unknown chunk between fmt and data
    val wav = Media.syntheticWav(1L, nSamples = 4)
    val pre = wav.take(36) // RIFF..fmt chunk end
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 7, 7, 7, 0)
    val post = wav.drop(36) // data chunk
    val spliced = pre ++ junk ++ post
    val Some((_, s)) = Media.decodeWav(spliced)
    assert(s.length == 4 && s(0).toLong == sample(1L, 0))
  }

  test("wavFrameFeatures: exact energy/zcr/peak, silence gate, tail drop") {
    val media = Seq((5L, Media.syntheticWav(5L, nSamples = 72)),
      (6L, "notawav".getBytes("US-ASCII"))).toDF("media_id", "payload")
    val out = Media.wavFrameFeatures(media).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(out.size == 4) // 72 samples -> 4 full frames, 8-sample tail dropped
    (0 until 4).foreach { f =>
      val ss = (f * 16 until f * 16 + 16).map(sample(5L, _))
      val want = ss.map(math.abs).sum
      assert(out(f.toLong).getAs[Long]("energy") == want)
      assert(out(f.toLong).getAs[Long]("peak") == ss.map(math.abs).max)
      assert(out(f.toLong).getAs[Long]("zcr") ==
        ss.sliding(2).count(p => p(0) * p(1) < 0))
      assert(out(f.toLong).getAs[Boolean]("is_active") == (want > 64 * 16))
    }
    // frame 0 is the quiet frame (|s| <= 32 -> energy <= 512 < 1024)
    assert(!out(0L).getAs[Boolean]("is_active"))
    assert(out(1L).getAs[Boolean]("is_active"))
  }

  test("activeSpans: bounds + energy of active frames; all-silent gets NULLs") {
    val frames = Seq(
      (1L, 0L, 10L, false), (1L, 1L, 5000L, true), (1L, 2L, 7000L, true),
      (1L, 3L, 9L, false),
      (2L, 0L, 3L, false)).toDF("media_id", "frame_idx", "energy", "is_active")
    val out = Media.activeSpans(frames).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("active_start") == 1L)
    assert(out(1L).getAs[Long]("active_end") == 2L)
    assert(out(1L).getAs[Long]("active_energy") == 12000L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("active_start")))
    assert(out(2L).getAs[Long]("active_energy") == 0L)
  }

  test("videoFrames: stride sampling, real container walk, truncation drop") {
    val media = Seq((7L, Media.syntheticVideo(7L, nFrames = 8)),
      (8L, Media.syntheticVideo(8L, nFrames = 8).dropRight(20)),
      (9L, "VID?junk".getBytes("US-ASCII"))).toDF("media_id", "payload")
    val out = Media.videoFrames(media, stride = 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(7L)) // 8 truncated, 9 bad magic
    val idx = out.map(_.getLong(1)).sorted.toSeq
    assert(idx == Seq(0L, 2L, 4L, 6L))
    // each emitted payload is the exact P6 frame bytes
    out.foreach { r =>
      val f = r.getLong(1)
      val want = Multimodal.syntheticPpmVariant(7L * 1000 + f, 7L * 64 + f / 4)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2), want))
    }
  }

  test("keyframes: scene boundaries flagged, within-scene frames not") {
    val media = Seq((3L, Media.syntheticVideo(3L, nFrames = 16)))
      .toDF("media_id", "payload")
    val frames = Media.videoFrames(media, stride = 1)
    val out = Media.keyframes(frames).collect()
      .map(r => r.getLong(1) -> r.getAs[Boolean]("is_key")).toMap
    assert(out.size == 16)
    assert(out(0L)) // first frame is always a keyframe
    // replay the hashes to derive the expected flags independently
    val hs = Media.videoFrames(media, stride = 1).collect().map { r =>
      val grays = Multimodal.decodePpmGray(r.getAs[Array[Byte]](2)).get
      val total = grays.map(_.toLong).sum
      r.getLong(1) -> grays.zipWithIndex.collect {
        case (g, i) if g.toLong * grays.length > total => 1L << i
      }.sum
    }.toMap
    (1 until 16).foreach { f =>
      val want = java.lang.Long.bitCount(hs(f.toLong) ^ hs(f - 1L)) > 2
      assert(out(f.toLong) == want, s"frame $f")
    }
    // sanity: some boundary fired and some within-scene frame did not
    assert(out.values.exists(identity) && !out.values.forall(identity))
  }

  test("keyframes: ids beyond 2^43 and frame_idx beyond 2^20 don't collide") {
    // regression: the old packed (media_id << 20 | frame_idx) key
    // silently merged hash streams at these ranges
    val bigId = (1L << 50) + 7L
    val media = Seq((bigId, Media.syntheticVideo(3L, nFrames = 4)))
      .toDF("media_id", "payload")
    val frames = Media.videoFrames(media, stride = 1)
      .withColumn("frame_idx", col("frame_idx") + (1L << 21))
    val out = Media.keyframes(frames).collect()
    assert(out.length == 4)
    assert(out.forall(_.getLong(0) == bigId))
    assert(out.map(_.getLong(1)).sorted.toSeq ==
      (0L until 4L).map(_ + (1L << 21)).toSeq)
    assert(out.find(_.getLong(1) == (1L << 21)).get.getAs[Boolean]("is_key"))
  }

  test("ppmResize: nearest-neighbor plane, valid P6 out, guards") {
    val img = Multimodal.syntheticPpm(11L, w = 8, h = 6)
    val Some(small) = Media.ppmResize(img, 2)
    val Some((w, h, mr, mg, mb)) = Multimodal.decodePpm(small)
    assert(w == 4 && h == 3)
    // replay: sampled pixel (x,y) channel c = source byte 3*((2y)*8+2x)+c
    def px(j: Int) = ((1103515245L * (11L + j) + 12345L) % 256L).toDouble
    val want = for (c <- 0 to 2) yield
      (for (y <- 0 until 3; x <- 0 until 4)
        yield px(3 * ((2 * y) * 8 + 2 * x) + c)).sum / 12.0
    assert(math.abs(mr - want(0)) < 1e-12 && math.abs(mg - want(1)) < 1e-12 &&
      math.abs(mb - want(2)) < 1e-12)
    assert(Media.ppmResize(img, 3).isEmpty)  // 8 % 3 != 0
    assert(Media.ppmResize(Array[Byte](1, 2), 2).isEmpty)
    // resized frames flow through the DataFrame seam and drop bad rows
    val media = Seq((1L, img), (2L, Array[Byte](9))).toDF("media_id", "payload")
    assert(Media.resizePpm(media, 2).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
