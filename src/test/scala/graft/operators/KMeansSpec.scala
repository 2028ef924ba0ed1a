package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def cluster(center: Array[Double], n: Int, startId: Long) =
    (0 until n).map { i =>
      val v = center.zipWithIndex.map { case (c, d) =>
        (c + 0.01 * ((i * 7 + d * 3) % 5 - 2)).toFloat  // small deterministic jitter
      }
      (startId + i, v.toSeq)
    }

  private lazy val docs = (
    cluster(Array(10.0, 0.0, 0.0), 20, 0L) ++
    cluster(Array(0.0, 10.0, 0.0), 20, 100L) ++
    cluster(Array(0.0, 0.0, 10.0), 20, 200L)
  ).toDF("vec_id", "embedding")

  test("Lloyd iterations recover separable cluster directions") {
    val cents = KMeans.fit(docs, "vec_id", "embedding", k = 3, iterations = 4)
    assert(cents.length == 3)
    // each true cluster direction is dominated by exactly one centroid
    val dominant = cents.map(_._2.zipWithIndex.maxBy(_._1)._2).sorted
    assert(dominant.toSeq == Seq(0, 1, 2), cents.map(_._2.mkString(",")).mkString(" | "))
  }

  test("deterministic across calls") {
    val a = KMeans.fit(docs, "vec_id", "embedding", k = 3, iterations = 3)
    val b = KMeans.fit(docs, "vec_id", "embedding", k = 3, iterations = 3)
    assert(a.toSeq == b.toSeq)
  }

  test("ivfTopK accepts k-means centroids and keeps exact same-cluster neighbors") {
    val cents = KMeans.fit(docs, "vec_id", "embedding", k = 3, iterations = 4)
    val out = Similarity.ivfTopK(
      docs.where(col("vec_id") === 0L), docs, k = 3,
      nCells = 3, nProbe = 1, centroids = Some(cents))
    val nids = out.select("nid").as[Long].collect().toSet
    assert(nids.size == 3)
    // probe of the query's own cluster cell: all neighbors from cluster 0
    assert(nids.forall(_ < 100L), nids.toString)
  }
}
