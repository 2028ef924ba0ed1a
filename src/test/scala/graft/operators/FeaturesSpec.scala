package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("oofTargetEncoding: leakage-free means, smoothing, fold arithmetic") {
    // two categories, k=2; construct ids whose LCG fold is known
    def fold(id: Long, k: Int) =
      (((id * 1103515245L + 12345L) % 2147483648L) % k).toInt
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L),
      ("b", 5L, 100L), ("b", 6L, 200L))
    val df = rows.toDF("cat", "id", "y")
    val out = Features.oofTargetEncoding(df, "cat", "id", "y", k = 2, m = 0.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_in"), r.getAs[Long]("n_out"),
          r.getAs[Double]("oof_mean")))).toMap
    // replay: per (cat, fold) the encoding is the mean of the OTHER fold
    val byCell = rows.groupBy { case (c, id, _) => (c, fold(id, 2).toLong) }
    byCell.foreach { case ((c, f), cell ) =>
      val out_rows = rows.filter(r => r._1 == c && fold(r._2, 2).toLong != f)
      val want = out_rows.map(_._3).sum.toDouble / out_rows.size
      val (nIn, nOut, enc) = out((c, f))
      assert(nIn == cell.size && nOut == out_rows.size)
      assert(math.abs(enc - want) < 1e-9, s"($c,$f): $enc != $want")
    }
  }

  test("oofTargetEncoding: m pseudo-observations shrink toward the global mean") {
    val df = Seq(("a", 1L, 0L), ("a", 2L, 10L), ("b", 3L, 100L), ("b", 4L, 110L))
      .toDF("cat", "id", "y")
    val big = Features.oofTargetEncoding(df, "cat", "id", "y", k = 2, m = 1e9)
      .collect().map(_.getAs[Double]("oof_mean"))
    val mu = (0 + 10 + 100 + 110) / 4.0
    big.foreach(e => assert(math.abs(e - mu) < 1e-3, s"$e !~ $mu"))
  }

  test("featureHash: polynomial hash, slot, sign, and signed sums replay") {
    def h(w: String) = w.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 2147483648L)
    val docs = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val out = Features.featureHash(docs, "doc_id", "text", numFeatures = 64)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("slot")) ->
        ((r.getAs[Long]("value"), r.getAs[Long]("n_terms")))).toMap
    def slot(w: String) = h(w) % 64
    def sign(w: String) = 1L - 2L * ((h(w) / 64) % 2)
    // "ab" and "cd" COLLIDE into slot 33 — the signed counts must merge
    // within the slot (sign(ab)=+1 twice, sign(cd)=-1 -> value 1, n 3)
    assert(slot("ab") == slot("cd"))
    val want = Map(1L -> Seq("ab", "ab", "cd"), 2L -> Seq("ab")).flatMap {
      case (doc, ws) => ws.groupBy(slot).map { case (sl, g) =>
        (doc, sl) -> ((g.map(sign).sum, g.size.toLong))
      }
    }
    assert(out == want, s"$out != $want")
    // slots bounded, no fitted state: every slot in [0, 64)
    assert(out.keys.forall { case (_, s) => s >= 0 && s < 64 })
  }
}
