package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Viterbi: same contract as Unigram.segment — maximize the
    * lp sum; ties break to the smallest start (longest final piece).
    */
  private def refSegment(word: String, vocab: Map[String, Double],
                         maxLen: Int): Seq[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(-1e18)
    val bp = Array.fill(n + 1)(-1)
    val pc = Array.fill(n + 1)("")
    best(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
      val piece = word.substring(j, i)
      vocab.get(piece).foreach { lp =>
        val s = best(j) + lp
        if (s > best(i)) { best(i) = s; bp(i) = j; pc(i) = piece }
      }
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var pos = n
    while (pos > 0) { out.prepend(pc(pos)); pos = bp(pos) }
    out.toSeq
  }

  test("segment matches the reference Viterbi, including ties and longest-piece preference") {
    val vocab = Map("a" -> -1.0, "b" -> -1.2, "ab" -> -0.5, "ba" -> -2.0,
      "bab" -> -1.6, "abab" -> -3.1, "c" -> -2.0)
    val words = Seq(("abab", 3L), ("ba", 2L), ("bacab", 1L), ("a", 5L),
      ("cabbab", 1L)).toDF("word", "freq")
    val got = Unigram.segment(words, vocab, maxLen = 4)
      .select(col("word"), col("pieces")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for ((w, _) <- Seq(("abab", 0), ("ba", 0), ("bacab", 0), ("a", 0), ("cabbab", 0)))
      assert(got(w) == refSegment(w, vocab, 4).toList, s"word=$w")
  }

  test("segment matches the reference on the real corpus vocabulary") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val words = Unigram.wordTable(docs, "text").localCheckpoint()
    val vocab = Unigram.collectVocab(
      Unigram.withLogProbs(Unigram.seedVocab(words, 4, 150)))
    val got = Unigram.segment(words, vocab, 4)
      .select(col("word"), col("pieces")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val w = r.getString(0)
      val ps = r.getSeq[String](1).toList
      assert(ps.mkString("") == w, s"coverage broken for '$w': $ps")
      assert(ps == refSegment(w, vocab, 4).toList, s"word=$w")
    }
  }

  test("span-table segmenter equals the literal-map segmenter piece-for-piece") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val words = Unigram.wordTable(docs, "text").localCheckpoint()
    val vocabDf = Unigram.withLogProbs(Unigram.seedVocab(words, 4, 150))
      .localCheckpoint()
    val vm = Unigram.collectVocab(vocabDf)
    val a = Unigram.segment(words, vm, 4)
      .select(col("word"), col("pieces")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val b = Unigram.segmentJoin(words, vocabDf, 4)
      .select(col("word"), col("pieces")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(a == b)
  }

  test("train is deterministic, keeps every character, and respects the size cap") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val v1 = Unigram.train(docs, "text", maxLen = 4, seedSize = 120,
      vocabSize = 60, emRounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val v2 = Unigram.train(docs, "text", maxLen = 4, seedSize = 120,
      vocabSize = 60, emRounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(v1.sameElements(v2))
    val pieces = v1.map(_._1).toSet
    val chars = Unigram.wordTable(docs, "text").select(col("word"))
      .collect().flatMap(_.getString(0).toCharArray.map(_.toString)).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    assert(v1.count(_._1.length > 1) <= 60)
    assert(v1.forall(_._3 < 0.0))
  }

  test("tokenCounts reassembles the corpus exactly (sum of piece lengths == total chars)") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val vocab = Unigram.collectVocab(
      Unigram.train(docs, "text", maxLen = 4, seedSize = 120,
        vocabSize = 60, emRounds = 1))
    val counts = Unigram.tokenCounts(docs, "text", vocab, 4)
    val pieceChars = counts.agg(sum(length(col("piece")) * col("n")))
      .head().getLong(0)
    val totalChars = Unigram.wordTable(docs, "text")
      .agg(sum(length(col("word")) * col("freq"))).head().getLong(0)
    assert(pieceChars == totalChars)
  }
}
