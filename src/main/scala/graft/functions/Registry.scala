package graft.functions

import graft.expressions.CosineSim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL registration: exposes the engine's functions to `spark.sql(...)`
  * so the surface is usable from pure SQL, not only the Scala API. Each
  * registration binds the SAME native column expressions the Scala API
  * uses (via the Column<->Expression bridge) — no UDF wrappers, so SQL
  * callers get identical semantics and codegen.
  */
object Registry {

  private def wrap1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression =
    exprs => ColumnBridge.expressionEager(f(ColumnBridge.column(exprs.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("clean_text", wrap1(TextFns.cleanText), "built-in")
    reg.createOrReplaceTempFunction("doc_fingerprint", wrap1(TextFns.fingerprint), "built-in")
    reg.createOrReplaceTempFunction("lang_id", wrap1(TextFns.langId(_)), "built-in")
    reg.createOrReplaceTempFunction("token_count", wrap1(TextFns.tokenCount), "built-in")
    reg.createOrReplaceTempFunction("sentiment_scores",
      wrap1(SentimentFns.sentiment(_)), "built-in")
    reg.createOrReplaceTempFunction("pii_redact", wrap1(PiiFns.redact), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => graft.expressions.SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("cms_estimate",
      exprs => graft.expressions.CmsEstimate(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("topk_by_sim",
      // bounded top-k aggregate: topk_by_sim(sim, nid, k) with literal k
      exprs => {
        def bad(why: String) =
          new org.apache.spark.sql.AnalysisException(
            s"topk_by_sim requires (sim double, nid bigint, literal int k): $why",
            None, None, None, None, Map.empty,
            Array.empty[org.apache.spark.QueryContext])
        if (exprs.length != 3 || !exprs(2).foldable)
          throw bad("k must be a foldable literal")
        exprs(2).eval(null) match {
          case n: Number =>
            graft.expressions.TopKSimAgg(exprs(0), exprs(1), n.intValue())
              .toAggregateExpression()
          case other => throw bad(s"got ${if (other == null) "NULL" else other}")
        }
      }, "built-in")
    reg.createOrReplaceTempFunction("minhash_sigs",
      // numHashes must be a literal int: SQL form minhash_sigs(hashes, 32).
      // Checked eagerly — a column reference here would otherwise surface
      // as an opaque NPE from eval at bind time.
      exprs => {
        def bad(why: String) =
          new org.apache.spark.sql.AnalysisException(
            s"minhash_sigs requires (hashes array, literal int numHashes): $why",
            None, None, None, None, Map.empty,
            Array.empty[org.apache.spark.QueryContext])
        if (exprs.length != 2 || !exprs(1).foldable)
          throw bad("the second argument must be a foldable literal")
        exprs(1).eval(null) match {
          case n: Number => graft.expressions.MinHashSigs(exprs(0), n.intValue())
          case other => throw bad(s"got ${if (other == null) "NULL" else other}")
        }
      }, "built-in")
  }
}
