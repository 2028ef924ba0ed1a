package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an `array<float>`
  * embedding column (north-star extension — SURVEY.md §7.6).
  *
  * Scale shape: the query set is broadcast (small side), the corpus
  * streams through a broadcast-nested-loop with a codegen'd cosine — at
  * 100 TB the corpus never shuffles; the per-query top-k reduces
  * map-side via the rank window over (query partition).
  */
object Similarity {

  /** Exact brute-force top-k by cosine. `queries` must be small enough to
    * broadcast (it is hinted); ties broken by neighbor id.
    * Output: qid, nid, sim (raw double — bit-reproducible), rnk.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("sim", graft.expressions.CosineSim(col("qvec"), col("nvec")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rnk"))
  }

  /** IVF-style ANN: corpus vectors are assigned to the nearest of
    * `nCells` coarse centroids (deterministic seeds: the first nCells
    * corpus vectors — no RNG, reproducible); each query probes its
    * `nProbe` nearest cells and scores only those cells' members. The
    * inverted-file shape: at scale the cells are the partition key, the
    * probe prunes (nCells - nProbe)/nCells of the corpus from every
    * query, and only centroids (tiny) broadcast.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell"), col(vecCol).as("cvec")))
    def assign(df: DataFrame, id: String, vec: String, keep: Int) = {
      val w = Window.partitionBy(id).orderBy(col("_cd").desc, col("cell"))
      df.crossJoin(cents)
        .withColumn("_cd", CosineSimCol(col(vec), col("cvec")))
        .withColumn("_cr", row_number().over(w))
        .where(col("_cr") <= keep)
        .drop("cvec", "_cd", "_cr")
    }
    val corpusCells = assign(
      corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nid", "nvec", 1)
    val queryCells = assign(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")), "qid", "qvec", nProbe)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    corpusCells.join(queryCells, Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", CosineSimCol(col("qvec"), col("nvec")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rnk"))
  }

  private def CosineSimCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.expressions.CosineSim(a, b)

  /** LSH-bucketed ANN: random-hyperplane signatures (sign of dot with
    * `nBits` deterministic pseudo-random planes) bucket the corpus; only
    * same-bucket pairs are scored. Trades recall for a shuffle-free
    * probe at scale. Planes are derived from a seeded hash of
    * (bit, dim) — no RNG state, reproducible anywhere.
    */
  def lshBucketTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    nBits: Int = 12, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    def sig(vec: String) = {
      val bits = (0 until nBits).map { b =>
        // plane(b)[i] = centered hash of (b, i): deterministic pseudo-random
        val proj = aggregate(
          zip_with(VectorFns.toDoubleArr(col(vec)),
            sequence(lit(0), size(col(vec)) - 1),
            (x, i) => x * (pmod(xxhash64(lit(b) * lit(1000003) + i), lit(1000L)).cast("double") - lit(499.5))),
          lit(0.0), (s, v) => s + v)
        when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("bucket", sig("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("bucket", sig("nvec"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", graft.expressions.CosineSim(col("qvec"), col("nvec")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rnk"))
  }
}
