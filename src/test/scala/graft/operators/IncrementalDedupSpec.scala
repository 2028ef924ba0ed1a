package graft.operators

import graft.SparkSpec
import graft.sources.{Scratch, ViewStore}
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def store(name: String) =
    new ViewStore(spark, Scratch.processScoped(name, "spec") + "/store")

  private val hist = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "red orange yellow green blue indigo violet")
  ).toDF("doc_id", "text")

  test("exact copy and near-dup drop; novel doc survives and is absorbed") {
    val st = store("incdedup1")
    IncrementalDedup.snapshot(st, "fps", hist, "doc_id", "text")
    val batch = Seq(
      (10L, "one two three four five six seven eight nine ten"), // exact copy of 2
      (11L, "alpha beta gamma delta epsilon zeta eta iota"),     // near-dup of 1
      (12L, "completely different words entirely novel content here")
    ).toDF("doc_id", "text")
    val surv = IncrementalDedup.dedupAgainst(st, "fps", batch, hist,
      "doc_id", "text", estThreshold = 0.2, jaccardThreshold = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(surv == Set(12L), surv.toString)
    IncrementalDedup.absorb(st, "fps",
      batch.where(col("doc_id").isin(surv.toSeq: _*)), "doc_id", "text")
    // the store now holds hist + the survivor
    val ids = st.read("fps").select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 12L))
  }

  test("a later batch dedups against absorbed survivors (incremental property)") {
    val st = store("incdedup2")
    IncrementalDedup.snapshot(st, "fps", hist, "doc_id", "text")
    val b1 = Seq((20L, "completely different words entirely novel content here"))
      .toDF("doc_id", "text")
    IncrementalDedup.absorb(st, "fps",
      IncrementalDedup.dedupAgainst(st, "fps", b1, hist, "doc_id", "text"),
      "doc_id", "text")
    // batch 2 contains an exact copy of batch 1's survivor: it must drop
    // against the UPDATED store even though it never appeared in hist
    val b2 = Seq(
      (30L, "completely different words entirely novel content here"),
      (31L, "yet more unrelated fresh material nothing shared anywhere")
    ).toDF("doc_id", "text")
    val histNow = hist.unionByName(b1) // master corpus after batch 1
    val surv2 = IncrementalDedup.dedupAgainst(st, "fps", b2, histNow,
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(surv2 == Set(31L), surv2.toString)
  }

  test("fingerprints carry digest/sig/shard and digests match md5") {
    val fps = IncrementalDedup.fingerprints(hist, "doc_id", "text").collect()
    assert(fps.length == 3)
    val d = hist.select(md5(col("text").cast("binary"))).as[String].collect().toSet
    assert(fps.map(_.getAs[String]("digest")).toSet == d)
    assert(fps.forall(r => r.getAs[Seq[Long]]("sig").length == 32))
    assert(fps.forall(r => (0 until 8).contains(r.getAs[Int]("shard"))))
  }
}
