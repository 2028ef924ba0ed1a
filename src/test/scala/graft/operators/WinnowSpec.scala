package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def kgramHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 2147483648L)

  /** Reference winnowing replayed independently in plain Scala. */
  private def reference(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val hs = (0 to text.length - k).map(i => kgramHash(text.substring(i, i + k)))
    if (hs.isEmpty) Set.empty
    else (1 to math.max(hs.length - w + 1, 1)).map { j =>
      val win = (j to math.min(j + w - 1, hs.length)).map(q => (hs(q - 1), q))
      // rightmost min: scan left to right, <= replaces
      win.foldLeft((Long.MaxValue, -1L)) { case (acc, (h, p)) =>
        if (h <= acc._1) (h, p.toLong) else acc
      }
    }.map { case (h, p) => (p, h) }.toSet
  }

  test("fingerprints match the reference algorithm, including tie and short docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaa"),          // all k-grams identical -> heavy ties
      (3L, "abcdefg"),             // fewer hashes than w -> one window
      (4L, "abcd"),                // exactly k-1 short of 2 hashes
      (5L, "abc"))                 // shorter than k -> no output
      .toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val want = reference(text, 5, 4)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
    assert(!got.contains(5L))
    // ties in doc 2: every window's min is the same hash, rightmost pos
    // per window, deduped — positions w..n for n identical hashes
    assert(got(2L).map(_._2).size == 1)
  }

  test("coverage guarantee: shared substring >= w+k-1 chars shares a fingerprint") {
    val shared = "common boilerplate sentence here"
    val docs = Seq(
      (1L, "prefix one " + shared + " tail a"),
      (2L, "completely different opening " + shared + " other end"))
      .toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    // and sharedPairs surfaces the pair with a positive count
    val pairs = Winnow.sharedPairs(fps, "doc_id", minShared = 2).collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 1L &&
      pairs.head.getLong(1) == 2L && pairs.head.getAs[Long]("n_shared") >= 2L)
  }

  test("density: selections are ~2/(w+1) of k-gram positions on random text") {
    val rnd = new scala.util.Random(7)
    val text = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val n = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4).count()
    val positions = text.length - 5 + 1
    val density = n.toDouble / positions
    assert(density > 0.25 && density < 0.55, s"density $density")
  }
}
