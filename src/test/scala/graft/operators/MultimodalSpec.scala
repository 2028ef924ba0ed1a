package graft.operators

import graft.SparkSpec

/** The real-decoder half of the multimodal seam (the histogram/stub half
  * is covered in SimilaritySpec's extractFeatures case): P6 parse
  * round-trip, header tolerance, malformed-payload rejection, and the
  * partition-iterator frame path.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodePpm round-trips syntheticPpm: dimensions and channel means") {
    val payload = Multimodal.syntheticPpm(7L, w = 8, h = 6)
    val Some((w, h, mr, mg, mb)) = Multimodal.decodePpm(payload)
    assert(w == 8 && h == 6)
    // recompute the means straight from the generator formula
    val bytes = (0 until 8 * 6 * 3).map(i => ((1103515245L * (7L + i) + 12345L) % 256L).toDouble)
    def mean(ch: Int) = bytes.zipWithIndex.collect { case (b, i) if i % 3 == ch => b }.sum / 48.0
    assert(mr == mean(0) && mg == mean(1) && mb == mean(2))
  }

  test("decodePpm tolerates comments and extra whitespace in the header") {
    val pixels = Multimodal.syntheticPpm(1L, 2, 2).takeRight(12)
    val loose = ("P6\n# a comment line\n 2\t2 # trailing\n255\n").getBytes("US-ASCII") ++ pixels
    val strict = Multimodal.decodePpm(Multimodal.syntheticPpm(1L, 2, 2))
    assert(Multimodal.decodePpm(loose) == strict)
  }

  test("decodePpm returns None for malformed payloads, never throws") {
    val good = Multimodal.syntheticPpm(3L, 4, 4)
    assert(Multimodal.decodePpm(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodePpm("P5\n4 4\n255\n".getBytes("US-ASCII")).isEmpty) // wrong magic
    assert(Multimodal.decodePpm(good.dropRight(1)).isEmpty) // truncated plane
    assert(Multimodal.decodePpm("P6\n4 4\n65535\n".getBytes("US-ASCII") ++
      new Array[Byte](4 * 4 * 6)).isEmpty) // 2-byte samples unsupported
    assert(Multimodal.decodePpm("P6\n0 4\n255\n".getBytes("US-ASCII")).isEmpty) // zero dim
    // plane size w*h*3 overflows Int to a negative number: the length
    // guard must not pass and hand back zeroed "features" for a body
    // that obviously isn't there
    assert(Multimodal.decodePpm("P6\n50000 50000\n255\n".getBytes("US-ASCII") ++
      new Array[Byte](64)).isEmpty)
  }

  test("ppmFeatures drops undecodable rows and keeps decoded fields") {
    val media = Seq(
      (1L, Multimodal.syntheticPpm(1L)),
      (2L, "not an image".getBytes("US-ASCII")),
      (3L, Multimodal.syntheticPpm(3L))
    ).toDF("media_id", "payload")
    val out = Multimodal.ppmFeatures(media).collect()
    assert(out.map(_.getAs[Long]("media_id")).sorted.toSeq == Seq(1L, 3L))
    out.foreach { r =>
      assert(r.getAs[Long]("width") == 8L && r.getAs[Long]("height") == 6L &&
        r.getAs[Long]("n_px") == 48L)
      Seq("mean_r", "mean_g", "mean_b").foreach { c =>
        val m = r.getAs[Double](c)
        assert(m >= 0.0 && m <= 255.0)
      }
    }
  }

  test("aHash bits replay the integer gray-vs-mean compare; bad payloads drop") {
    val media = Seq(
      (1L, Multimodal.syntheticPpm(1L)),
      (2L, "junk".getBytes("US-ASCII"))).toDF("media_id", "payload")
    val out = Multimodal.aHashes(media).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_px") == 48L)
    // reference hash computed independently from the LCG bytes
    val grays = (0 until 48).map { p =>
      (0 until 3).map(c => ((1103515245L * (1L + 3 * p + c) + 12345L) % 256L).toInt).sum
    }
    val total = grays.map(_.toLong).sum
    val want = grays.zipWithIndex.collect {
      case (g, i) if g.toLong * 48 > total => 1L << i
    }.sum
    assert(out.head.getAs[Long]("phash") == want)
  }

  test("perceptualNearDupPairs equals brute-force Hamming <= 3 (pigeonhole)") {
    val media = (0L until 60L).map(id =>
      (id, Multimodal.syntheticPpmVariant(id, id % 6))).toDF("media_id", "payload")
    val hashes = Multimodal.aHashes(media)
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3
    } yield (a, b)).toSet
    assert(want.nonEmpty) // fixture sanity: the groups do produce pairs
    val got = Multimodal.perceptualNearDupPairs(hashes)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("ppmPatches: patch means recompose to the whole-image means; positions cover the grid") {
    val media = Seq((7L, Multimodal.syntheticPpm(7L))).toDF("media_id", "payload")
    val patches = Multimodal.ppmPatches(media, pw = 4, ph = 3).collect()
    assert(patches.length == 4) // 8x6 / 4x3 = 2x2 grid
    assert(patches.map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    assert(patches.forall(_.getLong(3) == 12L))
    // equal-sized patches: whole-image mean = mean of patch means
    val whole = Multimodal.ppmFeatures(media).collect().head
    for ((c, wi) <- Seq(4 -> 4, 5 -> 5, 6 -> 6)) {
      val recomposed = patches.map(_.getDouble(c)).sum / 4
      assert(math.abs(recomposed - whole.getDouble(wi)) < 1e-9)
    }
  }

  test("ppmPatches: non-dividing dimensions and broken payloads are skipped") {
    val media = Seq(
      (1L, Multimodal.syntheticPpm(1L)),            // 8x6: divides by 3x2
      (2L, Array[Byte](1, 2, 3)),                   // not a PPM
      (3L, Multimodal.syntheticPpm(3L))).toDF("media_id", "payload")
    val got = Multimodal.ppmPatches(media, pw = 3, ph = 2)
    // 8 % 3 != 0: every valid image is out of contract -> empty
    assert(got.isEmpty)
    val ok = Multimodal.ppmPatches(media, pw = 2, ph = 2).collect()
    assert(ok.map(_.getLong(0)).toSet == Set(1L, 3L)) // id 2 skipped
    assert(ok.length == 2 * 12) // 4x3 grid each
  }
}
