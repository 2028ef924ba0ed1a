package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact n-gram decontamination: constructed overlaps (per-position
  * counting, distinct-gram counting), the n-length dial, clean docs
  * absent, and the broadcast shape of the eval side.
  */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  test("per-position hits, distinct grams, clean docs absent") {
    val evalSet = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      // "the quick brown" at two positions -> 2 hits, 1 distinct gram
      (1L, "the quick brown dog and the quick brown cat ate"),
      // two DIFFERENT eval trigrams once each
      (2L, "quick brown fox sat brown fox jumps"),
      (3L, "completely clean text with no overlap at all")
    ).toDF("doc_id", "text")
    val got = Decontam.ngramHits(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 1L)), 2L -> ((2L, 2L))))
  }

  test("n is the precision dial: longer n-grams stop matching") {
    val evalSet = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq((1L, "zzz alpha beta gamma yyy")).toDF("doc_id", "text")
    assert(Decontam.ngramHits(train, evalSet, "doc_id", "text", 3).count() == 1)
    assert(Decontam.ngramHits(train, evalSet, "doc_id", "text", 4).count() == 0)
  }

  test("the eval gram set is the broadcast build side") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val df = Decontam.ngramHits(
      docs.where(pmod(col("doc_id"), lit(97)) =!= 0),
      docs.where(pmod(col("doc_id"), lit(97)) === 0),
      "doc_id", "text", 6)
    val p = df.queryExecution.sparkPlan
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, p.toString)
  }
}
