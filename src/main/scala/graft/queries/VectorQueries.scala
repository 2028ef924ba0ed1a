package graft.queries

import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search and dedup surface over `embeddings`/`documents`
  * (north-star operators — SURVEY.md §7.6). Hash-based signatures
  * (MinHash/SimHash) have no SQL-portable oracle and get rows-only
  * checks; everything else is oracle-backed.
  */
object VectorQueries {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force exact ANN baseline: 10 broadcast queries × corpus,
    // codegen'd cosine, per-query top-5.
    "q20_knn_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.where(col("vec_id") < 10), emb, 5)
    }),

    // Embedding near-dup: top same-label pair similarity, blocked by label
    // (bounded to vec_id < 500 so the pair count is scale-invariant).
    "q21_embedding_pairs" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").where(col("vec_id") < 500)
      val w = Window.partitionBy("label").orderBy(col("sim").desc, col("a_id"), col("b_id"))
      Dedup.embeddingPairs(emb, "vec_id", "embedding", "label")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3)
    }),

    // Blocked n-gram Jaccard similarity (exact-verify stage of near-dup
    // dedup; blocking keys stand in for LSH candidates).
    "q22_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          Seq("lang", "n_chars"), n = 2)
        .select(col("a_id"), col("b_id"), col("jaccard"))
    }),

    // MinHash+LSH candidate generation + signature-estimate (rows-only:
    // xxhash64 signatures aren't SQL-portable).
    "q23_minhash_lsh" -> ((s, dir) => {
      Dedup.minHashLsh(t(s, dir, "documents"), "doc_id", "text")
        .select(col("a_id"), col("b_id"), round(col("jaccard_est"), 6).as("jaccard_est"))
        .orderBy(col("jaccard_est").desc, col("a_id"), col("b_id"))
        .limit(100)
    }),

    // SimHash 64-bit signatures (rows-only).
    "q24_simhash" -> ((s, dir) => {
      Dedup.simHash(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("simhash"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q20_knn_cosine" ->
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id < 10),
              p AS (SELECT q.qid, e.vec_id AS nid,
                    ${SqlFragments.cosineExpr("q.qe", "CAST(e.embedding AS DOUBLE[])")} AS sim
                    FROM q, embeddings e WHERE e.vec_id <> q.qid),
              r AS (SELECT qid, nid, sim,
                    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
                    FROM p)
         SELECT qid, nid, sim, rnk FROM r WHERE rnk <= 5""",
    "q21_embedding_pairs" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings WHERE vec_id < 500),
              p AS (SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
                    ${SqlFragments.cosineExpr("a.v", "b.v")} AS sim
                    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
              r AS (SELECT label, a_id, b_id, sim,
                    CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY sim DESC, a_id, b_id) AS BIGINT) AS rnk
                    FROM p)
         SELECT label, a_id, b_id, sim, rnk FROM r WHERE rnk <= 3""",
    "q22_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, lang, n_chars,
                     list_distinct(${SqlFragments.bigramsExpr(SqlFragments.toksExpr)}) AS sh
                     FROM documents)
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                  len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM d a JOIN d b
            ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id"""
  )
}
