package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),   // near dup
    (4L, "completely different content about spark engines and batch jobs"),
    (5L, "another unrelated snippet regarding window aggregation semantics")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length == 4)
    val dup = out.find(_.getAs[Long]("dup_cnt") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash: identical docs share full signature; estimate tracks jaccard") {
    val sigs = Dedup.minHashSignatures(docs, "text", 32)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val est34 = sigs(3L).zip(sigs(4L)).count { case (a, b) => a == b } / 32.0
    val est13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } / 32.0
    assert(est13 > est34) // near-dup pair more similar than unrelated pair
  }

  test("minhash LSH surfaces the exact and near dup as candidates") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text")
      .select("a_id", "b_id", "jaccard_est").as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("simhash: hamming(near dups) < hamming(unrelated)") {
    val sh = Dedup.simHash(docs, "text").select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L))
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)))
  }

  test("ngram jaccard: dup pair scores 1.0 within block") {
    val blocked = docs.withColumn("blk", lit(1))
    val pairs = Dedup.ngramJaccardPairs(blocked, "doc_id", "text", Seq("blk"))
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 1.0)
    val near = pairs.find(p => p._1 == 1L && p._2 == 3L).get._3
    val far = pairs.find(p => p._1 == 1L && p._2 == 4L).get._3
    assert(near > far)
  }
}
