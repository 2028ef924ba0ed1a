package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-row distance-to-centroid column for the assignment argmin:
    * negated cosine (the IVF affinity) or squared L2 (the PQ metric;
    * no sqrt — argmin is monotonic in the square). Both are
    * left-to-right element-order folds the SQL oracle mirrors
    * op-for-op (SqlFragments.cosineExpr / l2sqExpr).
    */
  private def distTo(vec: Column, cent: Seq[Double], distance: String): Column =
    distance match {
      case "cosine" => -graft.expressions.CosineSim(vec, typedlit(cent))
      case "l2" => aggregate(
        zip_with(vec, typedlit(cent), (x, c) => (x - c) * (x - c)),
        lit(0.0), (s, d) => s + d)
      case other => throw new IllegalArgumentException(s"distance: $other")
    }

  /** @param distance "cosine" (default — the IVF affinity) or "l2"
    *                 (squared euclidean — the PQ/SQ metric).
    * @param stableScale when set, each centroid mean is passed through
    *                 NumFns.stableRound(_, scale) INSIDE the aggregation
    *                 query, so the collected centroids are
    *                 decimal-parsed doubles a DuckDB oracle reproduces
    *                 bit-for-bit (r15 of SUM/COUNT) — the device that
    *                 makes Lloyd iterations oracle-replayable despite
    *                 order-dependent double sums.
    * @return (cell id, centroid) pairs, cell ids 0..k-1; deterministic:
    *         seeds are the first k vectors by id order.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int = 5, distance: String = "cosine",
          stableScale: Option[Int] = None): Array[(Long, Seq[Double])] = {
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
        struct(distTo(col("_v"), v, distance).as("d"), lit(cid).as("cell"))
      }: _*)
      val assigned = data.withColumn("cell",
        element_at(array_sort(scored), 1).getField("cell"))
      // one hash aggregate: per-cell per-dimension mean (sum/count in
      // the same double division the oracle runs), collected to the
      // driver (k x dim values only); empty cells keep their previous
      // centroid
      val dim = cents.head._2.length
      val meanCols = (0 until dim).map { i =>
        val m = sum(element_at(col("_v"), i + 1)) / count(lit(1))
        stableScale.fold(m)(s => graft.functions.NumFns.stableRound(m, s)).as(s"_m$i")
      }
      val means = assigned.groupBy(col("cell"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getLong(0), (1 to dim).map(r.getDouble).toSeq))
        .toMap
      cents = cents.map { case (cid, prev) =>
        (cid, means.getOrElse(cid, prev))
      }
      it += 1
    }
    cents
  }
}
