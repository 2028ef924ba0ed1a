package graft.operators

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq("abcd abcd", "abcd ab").toDF("text")

  test("greedy longest-match with ## continuations, vocab from totals") {
    // freqs: abcd=3, ab=1. minCount=4 admits "ab" (3+1) but not
    // "abc"/"abcd"/"cd" (3) — so abcd segments ab|##c|##d
    val got = WordPiece.segmentCounts(docs, "text", minCount = 4L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("ab", 4L), ("##c", 3L), ("##d", 3L)), got.toString)
  }

  test("whole-word pieces win when frequent enough") {
    // minCount=3 admits abcd itself: both words segment unbroken
    val got = WordPiece.segmentCounts(docs, "text", minCount = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("abcd", 3L), ("ab", 1L)), got.toString)
  }
}
