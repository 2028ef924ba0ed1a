package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diversity-aware re-ranking: Maximal Marginal Relevance (Carbonell &
  * Goldstein 1998). Given per-query candidate lists (pre-bounded to a
  * small top-N by a first-stage retriever), greedily select `k` items,
  * each step maximizing `λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)` —
  * relevance traded against redundancy with what is already picked.
  *
  * The greedy loop is inherently sequential PER QUERY, so this is the
  * documented (d)-tier shape: `flatMapGroups` over the query key with
  * O(N·k) work and O(N) state per group — each group is a bounded
  * candidate list, never the corpus; the only shuffle is the groupByKey
  * on qid. Everything upstream (retrieval, top-N cut) stays declarative.
  *
  * Determinism: cosines replay CosineSim's fold (index-order
  * accumulation, float widened per element — bit-identical to the
  * DuckDB list_reduce mirror), the score combines as written
  * (λ·rel − (1−λ)·ms), and ties break by ascending nid — so an oracle
  * can replay the whole greedy exactly.
  */
object Rerank {

  /** Input columns: qidCol (long), nidCol (long), relCol (double — the
    * first-stage relevance), vecCol (array<float> — the candidate's
    * embedding for redundancy). Output: (qid, nid, step 1..k, score).
    */
  def mmrRerank(cands: DataFrame, k: Int, lambda: Double,
                qidCol: String = "qid", nidCol: String = "nid",
                relCol: String = "rel", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && lambda >= 0.0 && lambda <= 1.0)
    val spark = cands.sparkSession
    import spark.implicits._
    cands.select(col(qidCol).cast("long"), col(nidCol).cast("long"),
        col(relCol).cast("double"), col(vecCol))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // sort for deterministic scan order (tie-break by nid)
        val cs = it.toArray.sortBy(c => (c._2))
        val n = cs.length
        val picked = new Array[Int](math.min(k, n))
        val isPicked = new Array[Boolean](n)
        // running max-similarity-to-selected per candidate: updating it
        // once per new pick keeps a step at O(N) cosines, O(N·k) total.
        // -inf start, NOT 0: cosines are signed, and clamping a negative
        // maximum to zero would over-penalize anti-correlated candidates
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val out = Vector.newBuilder[(Long, Long, Long, Double)]
        var step = 0
        while (step < picked.length) {
          var bi = -1
          var bs = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!isPicked(i)) {
              val ms = if (step == 0) 0.0 else maxSim(i)
              val s = lambda * cs(i)._3 - (1.0 - lambda) * ms
              // strict > with ascending-nid scan = smallest nid wins ties
              if (s > bs) { bs = s; bi = i }
            }
            i += 1
          }
          picked(step) = bi
          isPicked(bi) = true
          out += ((qid, cs(bi)._2, (step + 1).toLong, bs))
          i = 0
          while (i < n) {
            if (!isPicked(i)) {
              val c = cosine(cs(i)._4, cs(bi)._4)
              if (c > maxSim(i)) maxSim(i) = c
            }
            i += 1
          }
          step += 1
        }
        out.result().iterator
      }
      .toDF("qid", "nid", "step", "score")
  }

  /** CosineSim's exact fold (index order, three accumulators, float
    * widened per element) — bit-identical to the codegen'd expression
    * and to the DuckDB list_reduce mirror.
    */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** NDCG@k over a scored candidate table — the ranking-quality half
    * of the eval family (recall@k is q167's): per query, DCG of the
    * top-k by (score desc, id) against the IDEAL ordering of the SAME
    * candidate set (rel desc, id) — the rerank-eval convention (how
    * well did the ranker ORDER what it retrieved; candidate recall is
    * measured separately). `log2` spelled `ln(x)/ln(2)` so both
    * engines share the arithmetic; the 10-element sums are r15'd per
    * the order-dependent-aggregate policy.
    *
    * Scale shape: two row_number windows partitioned by the query key
    * and one per-query agg — parallel across queries, O(candidates)
    * per query.
    */
  def ndcgAtK(scored: org.apache.spark.sql.DataFrame, qCol: String,
              idCol: String, scoreCol: String, relCol: String,
              k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"bad k=$k")
    val byScore = Window.partitionBy(col(qCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val byRel = Window.partitionBy(col(qCol))
      .orderBy(col(relCol).desc, col(idCol))
    def gain(rank: org.apache.spark.sql.Column) =
      col(relCol) / (log(rank.cast("double") + lit(1.0)) / log(lit(2.0)))
    val staged = scored
      .withColumn("_r", row_number().over(byScore))
      .withColumn("_ri", row_number().over(byRel))
    val dcg = staged.where(col("_r") <= k).groupBy(col(qCol))
      .agg(graft.functions.NumFns.stableRound(sum(gain(col("_r"))), 8).as("dcg"))
    val idcg = staged.where(col("_ri") <= k).groupBy(col(qCol))
      .agg(graft.functions.NumFns.stableRound(sum(gain(col("_ri"))), 8).as("idcg"))
    dcg.join(idcg, Seq(qCol))
      .withColumn("ndcg", graft.functions.NumFns.stableRound(
        when(col("idcg") === 0.0, lit(0.0)).otherwise(col("dcg") / col("idcg")), 8))
  }
}
