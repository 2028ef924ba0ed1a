package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL surface: registered functions usable from spark.sql with
  * semantics identical to the Scala column API.
  */
class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions equal the column API") {
    Registry.register(spark)
    graft.Tables.load(spark, sf(), "documents").limit(50)
      .createOrReplaceTempView("docs_reg_t")

    val viaSql = spark.sql(
      """SELECT doc_id, c, fp, l, n, s.pos AS p, r FROM (
           SELECT doc_id, clean_text(text) AS c, doc_fingerprint(text) AS fp,
           lang_id(text) AS l, token_count(text) AS n,
           sentiment_scores(text) AS s,
           pii_redact(text || ' a@b.io') AS r
           FROM docs_reg_t)""")
    val viaApi = graft.Tables.load(spark, sf(), "documents").limit(50)
      .select(col("doc_id"), TextFns.cleanText(col("text")).as("c"),
        TextFns.fingerprint(col("text")).as("fp"),
        TextFns.langId(col("text")).as("l"),
        TextFns.tokenCount(col("text")).as("n"),
        SentimentFns.sentiment(col("text")).getField("pos").as("p"),
        PiiFns.redact(concat(col("text"), lit(" a@b.io"))).as("r"))
    assert(viaSql.exceptAll(viaApi).count() == 0)
    assert(viaApi.exceptAll(viaSql).count() == 0)
  }

  test("signature expressions work in SQL and equal the operator path") {
    Registry.register(spark)
    graft.Tables.load(spark, sf(), "documents").limit(50)
      .createOrReplaceTempView("docs_sig_t")
    val viaSql = spark.sql(
      """SELECT doc_id,
           simhash64(transform(array_distinct(filter(split(lower(text), '\\s+'),
             t -> length(t) > 0)), t -> xxhash64(t))) AS sh,
           minhash_sigs(transform(array_distinct(filter(split(lower(text), '\\s+'),
             t -> length(t) > 0)), t -> pmod(xxhash64(t), 1000000007L)), 32) AS sig
         FROM docs_sig_t""")
    val viaApi = graft.operators.Dedup.minHashSignatures(
        graft.operators.Dedup.simHash(
          graft.Tables.load(spark, sf(), "documents").limit(50), "text"),
        "text", 32)
      .select(col("doc_id"), col("simhash").as("sh"), col("sig"))
    assert(viaSql.exceptAll(viaApi).count() == 0)
    assert(viaApi.exceptAll(viaSql).count() == 0)
  }

  test("topk_by_sim aggregate works in SQL and matches the rank window") {
    Registry.register(spark)
    graft.Tables.load(spark, sf(), "embeddings").limit(40)
      .createOrReplaceTempView("emb_topk_t")
    val viaSql = spark.sql(
      """SELECT p.qid, s.nid FROM (
           SELECT q.vec_id AS qid,
                  topk_by_sim(cosine_sim(q.embedding, c.embedding), c.vec_id, 4) AS topk
           FROM emb_topk_t q JOIN emb_topk_t c
             ON q.vec_id < 3 AND c.vec_id <> q.vec_id
           GROUP BY q.vec_id) p
         LATERAL VIEW inline(p.topk) s AS sim, nid""")
      .as[(Long, Long)].collect().toSet
    val emb = graft.Tables.load(spark, sf(), "embeddings").limit(40)
    val viaApi = graft.operators.Similarity
      .bruteForceTopK(emb.where(col("vec_id") < 3), emb, 4)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
    assert(viaSql == viaApi, s"$viaSql vs $viaApi")
  }

  test("topk_by_sim rejects a non-literal k with a clear error") {
    Registry.register(spark)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_by_sim(1.0d, 1L, id) FROM range(3) GROUP BY id")
    }
    assert(ex.getMessage.contains("topk_by_sim requires"), ex.getMessage)
  }

  test("cosine_sim works in SQL over embeddings") {
    Registry.register(spark)
    graft.Tables.load(spark, sf(), "embeddings").limit(20)
      .createOrReplaceTempView("emb_reg_t")
    val self = spark.sql(
      """SELECT cosine_sim(CAST(embedding AS ARRAY<DOUBLE>),
                           CAST(embedding AS ARRAY<DOUBLE>)) AS s
         FROM emb_reg_t""").as[Double].collect()
    assert(self.forall(s => math.abs(s - 1.0) < 1e-9))
  }
}
