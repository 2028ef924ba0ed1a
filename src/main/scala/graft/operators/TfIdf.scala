package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native TF-IDF (no MLlib hashing — exact terms, oracle-reproducible):
  * tf per (doc, token) via explode + hash aggregate, document frequency
  * per token, idf = ln((N+1)/(df+1)) + 1 (smoothed), scored and ranked
  * per document.
  *
  * Scale shape: two hash shuffles (doc,token then token), the corpus
  * size N is a 1-row broadcast cross join, ranking is a window over the
  * (doc) partition. No driver-side collect.
  */
object TfIdf {

  /** Per-(doc, token) TF-IDF scores. Output: doc_id, token, tf, tfidf. */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .withColumn("_toks", TextFns.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"), explode(col("_toks")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
      .select(col("doc_id"), col("token"), col("tf"), col("tfidf"))
  }

  /** Top-k tokens per document by TF-IDF (ties broken by token asc). */
  def topK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
    scores(docs, idCol, textCol)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }
}
