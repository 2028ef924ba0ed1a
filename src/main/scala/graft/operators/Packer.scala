package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step that turns a cleaned document corpus
  * into fixed-length training windows: documents are concatenated in a
  * deterministic order and cut every `budget` tokens (the GPT-style
  * concat-and-chunk layout; documents may straddle window boundaries,
  * which is exactly what the attention mask / document-boundary tokens
  * handle downstream). What training-data bookkeeping needs is the
  * INDEX of that layout — per document: its global token offset, the
  * first and last window it lands in, and its offset inside the first
  * — without materializing a single packed token.
  *
  * Scale shape: one deterministic shard per output file
  * (`pmod(id, shards)` — the same sharding the writer uses), then a
  * running token sum per shard (ordered window, incrementally
  * evaluated — the frame never buffers the shard) and pure per-row
  * integer arithmetic. Shards are independent, so the packing
  * parallelizes across the cluster; a single global order would
  * serialize the corpus through one task, which is why every real
  * packer shards first.
  */
object Packer {

  /** The packing index: (idCol, shard, n_toks, start_off, first_chunk,
    * last_chunk, chunk_off), offsets/chunks 0-based, chunks of
    * `budget` tokens within each shard's concatenation in ascending
    * `idCol` order. Empty/whitespace-only documents carry no tokens
    * and are excluded (they occupy no window space).
    */
  def chunkIndex(df: DataFrame, idCol: String, textCol: String,
                 budget: Int, shards: Int): DataFrame = {
    require(budget >= 1, s"bad budget=$budget")
    require(shards >= 1, s"bad shards=$shards")
    val counted = df.where(col(textCol).isNotNull)
      .select(col(idCol), TextFns.tokenCount(col(textCol)).as("n_toks"))
      .where(col("n_toks") > 0)
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
    val w = Window.partitionBy("shard").orderBy(idCol)
    counted
      .withColumn("_end", sum(col("n_toks")).over(w))
      .withColumn("start_off", col("_end") - col("n_toks"))
      .select(col(idCol), col("shard"), col("n_toks"), col("start_off"),
        expr(s"start_off div ${budget}L").as("first_chunk"),
        expr(s"(_end - 1) div ${budget}L").as("last_chunk"),
        pmod(col("start_off"), lit(budget.toLong)).as("chunk_off"))
  }
}
