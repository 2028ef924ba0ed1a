package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the
  * centroid-quality path for IVF ANN (Similarity.ivfTopK's default
  * "first k vectors by id" seeds are reproducible but arbitrary;
  * k-means centroids actually partition the space).
  *
  * Scale shape per iteration: assignment is a per-row argmin over the
  * k inlined centroid literals (zero shuffle, the same pattern as
  * ivfTopK's assignment); the re-estimation is one hash aggregate of
  * per-dimension sums keyed by cell. Only the k × dim centroid matrix
  * ever reaches the driver (seeds and per-iteration means) — the
  * corpus itself never collects.
  */
object KMeans {

  /** @return (cell id, centroid) pairs, cell ids 0..k-1; deterministic:
    *         seeds are the first k vectors by id order.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int = 5): Array[(Long, Seq[Double])] = {
    val data = df.select(col(idCol).as("_id"),
      transform(col(vecCol), _.cast("double")).as("_v"))
    var cents: Array[(Long, Seq[Double])] = data.orderBy(col("_id")).limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }
    require(cents.nonEmpty, "k-means needs a non-empty input")
    var it = 0
    while (it < iterations) {
      // per-row argmin over inlined centroid literals (ties -> lower cell)
      val scored = array(cents.map { case (cid, v) =>
        struct((-graft.expressions.CosineSim(col("_v"), typedlit(v))).as("neg"),
          lit(cid).as("cell"))
      }: _*)
      val assigned = data.withColumn("cell",
        element_at(array_sort(scored), 1).getField("cell"))
      // one hash aggregate: per-cell element-wise sum + count, then the
      // driver (k x dim values) forms the means; empty cells keep their
      // previous centroid
      val dim = cents.head._2.length
      val sums = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("_n"),
          array((0 until dim).map(i =>
            sum(element_at(col("_v"), i + 1)).as(s"_s$i")): _*).as("_sums"))
        .collect()
        .map(r => (r.getLong(0),
          (r.getLong(1), r.getSeq[Double](2))))
        .toMap
      cents = cents.map { case (cid, prev) =>
        sums.get(cid) match {
          case Some((n, s)) => (cid, s.map(_ / n))
          case None => (cid, prev)
        }
      }
      it += 1
    }
    cents
  }
}
