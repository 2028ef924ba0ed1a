package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges learns the reference-BPE merge sequence") {
    // classic BPE toy corpus: 'ab' dominates, then 'abc' forms
    val docs = Seq(
      (1L, "abc abc abd"),
      (2L, "abc abd xy"),
      (3L, "abc xy xy")
    ).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", rounds = 3)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    // corpus frequencies: abc=4, abd=2, xy=3
    // round 1: (a,b) = 4+2 = 6; round 2: (ab,c)=4 beats (x,y)=3, (ab,d)=2;
    // round 3: (x,y)=3
    assert(got == Seq(
      (1L, "a", "b", 6L),
      (2L, "ab", "c", 4L),
      (3L, "x", "y", 3L)))
  }

  test("merge fold is left-to-right non-overlapping: aaa -> [aa, a]") {
    val docs = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", rounds = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    // 'aaa' has (a,a) at 2 positions, 'aaaa' at 3 -> n = 5
    assert(merges == Seq((1L, "a", "a", 5L)))
    val vocab = Bpe.symbolVocab(docs, "text", Seq(("a", "a")))
      .as[(String, Long)].collect().toMap
    // aaa -> [aa, a]; aaaa -> [aa, aa]
    assert(vocab == Map("aa" -> 3L, "a" -> 1L))
  }

  test("early exhaustion: single-char vocabulary stops before the round budget") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(docs, "text", rounds = 5).count() == 0)
  }
}
