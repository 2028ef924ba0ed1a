package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concat-and-chunk packing index: hand-checked offsets and window
  * arithmetic, shard independence, straddling documents, and
  * partitioning invariance (the layout is a pure function of
  * (id order, token counts) — never of physical placement).
  */
class PackerSpec extends SparkSpec {
  import spark.implicits._

  test("offsets, windows, and straddles match the hand layout") {
    // one shard; budget 10. tokens: 4, 8, 3, 12 → offsets 0,4,12,15
    val docs = Seq(
      (0L, "a b c d"),                            // [0,4)   chunk 0..0
      (8L, "a a a a a a a a"),                    // [4,12)  chunk 0..1 (straddles)
      (16L, "x y z"),                             // [12,15) chunk 1..1
      (24L, "w w w w w w w w w w w w")            // [15,27) chunk 1..2 (straddles)
    ).toDF("doc_id", "text")
    val got = Packer.chunkIndex(docs, "doc_id", "text", budget = 10, shards = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (0L, 4L, 0L, 0L, 0L, 0L),
      (8L, 8L, 4L, 0L, 1L, 4L),
      (16L, 3L, 12L, 1L, 1L, 2L),
      (24L, 12L, 15L, 1L, 2L, 5L)))
  }

  test("shards pack independently; empty docs carry no window space") {
    val docs = Seq(
      (0L, "a b"), (2L, "c d e"),      // shard 0: offsets 0, 2
      (1L, "x"), (3L, "y z"),          // shard 1: offsets 0, 1
      (4L, "   "), (5L, null.asInstanceOf[String])) // no tokens -> absent
      .toDF("doc_id", "text")
    val got = Packer.chunkIndex(docs, "doc_id", "text", budget = 4, shards = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got == Map(
      0L -> (0L, 0L), 2L -> (0L, 2L),
      1L -> (1L, 0L), 3L -> (1L, 1L)))
  }

  test("the index is partitioning-invariant") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val a = Packer.chunkIndex(docs, "doc_id", "text", 256, 4)
      .collect().map(_.toString).toSet
    val b = Packer.chunkIndex(docs.repartition(13), "doc_id", "text", 256, 4)
      .collect().map(_.toString).toSet
    assert(a == b && a.nonEmpty)
  }

  test("FFD packing: first fit after the decreasing sort, oversize isolates") {
    import spark.implicits._
    // sorted desc: 9(own bin), 5, 4, 3, 2 at capacity 7:
    //   9 -> bin0 (oversize); 5 -> bin1; 4 -> bin2 (5+4>7);
    //   3 -> bin2 (4+3=7); 2 -> bin1 (5+2=7)
    val df = Seq((1L, 5L), (2L, 4L), (3L, 3L), (4L, 2L), (5L, 9L))
      .toDF("id", "len").withColumn("shard", org.apache.spark.sql.functions.lit(0))
    val got = Packer.firstFitDecreasing(df, "id", "len", "shard", capacity = 7L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 0L), (1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)),
      got.toString)
  }

  test("FFD packing: shards pack independently") {
    import spark.implicits._
    val df = Seq((1L, 6L, 0), (2L, 6L, 1), (3L, 1L, 0), (4L, 1L, 1))
      .toDF("id", "len", "shard")
    val got = Packer.firstFitDecreasing(df, "id", "len", "shard", capacity = 7L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0, 1L, 0L), (0, 3L, 0L), (1, 2L, 0L), (1, 4L, 0L)),
      got.toString)
  }
}
