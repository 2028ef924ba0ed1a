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

  /** First-fit-decreasing BIN PACKING per shard — the other packing
    * discipline ([[chunkIndex]] concatenates-and-splits; FFD keeps
    * documents WHOLE and minimizes wasted capacity, the classic
    * batch-assembly heuristic, ≤ 11/9·OPT+1 bins): items sort by
    * (length desc, id), each goes to the FIRST bin with room, else
    * opens a new bin. Oversize items each occupy their own bin.
    *
    * Scale shape: packing is inherently sequential, so the SHARD is
    * the parallel unit (the same contract every trainer's data loader
    * uses — order matters within a shard, shards are independent);
    * within a shard the whole FFD run is ONE codegen'd `aggregate()`
    * fold whose state is the bin-load array (O(bins) per item, no
    * positional `element_at` — the fit scan is itself a fold, ANSI-
    * safe). Output: (shard, id, bin), bins 0-based per shard.
    */
  def firstFitDecreasing(df: DataFrame, idCol: String, lenCol: String,
                         shardCol: String, capacity: Long): DataFrame = {
    require(capacity >= 1, s"bad capacity=$capacity")
    // first-fit index over the load array, or -1: a single fold pass
    def fit(loads: String, len: String) =
      s"""aggregate($loads,
            named_struct('i', cast(0 as bigint), 'f', cast(-1 as bigint)),
            (a, x) -> named_struct('i', a.i + 1,
              'f', if(a.f >= 0, a.f,
                      if(x + $len <= ${capacity}L, a.i, cast(-1 as bigint)))),
            a -> a.f)"""
    df.select(col(shardCol).as("shard"), col(idCol).cast("long").as("_id"),
        col(lenCol).cast("long").as("_len"))
      .groupBy(col("shard"))
      .agg(array_sort(collect_list(struct((-col("_len")).as("_nl"),
        col("_id"), col("_len")))).as("_it"))
      .select(col("shard"), explode(expr(s"""
        aggregate(_it,
          named_struct('loads', cast(array() as array<bigint>),
                       'asg', cast(array() as array<struct<id:bigint,bin:bigint>>)),
          (acc, it) -> element_at(transform(
            array(${fit("acc.loads", "it._len")}),
            f -> named_struct(
              'loads',
              if (f >= 0,
                transform(acc.loads, (x, j) -> if (j = f, x + it._len, x)),
                acc.loads || array(it._len)),
              'asg',
              acc.asg || array(named_struct('id', it._id,
                'bin', if (f >= 0, f, cast(size(acc.loads) as bigint)))))),
            1),
          acc -> acc.asg)""")).as("_a"))
      .select(col("shard"), col("_a.id").as(idCol), col("_a.bin"))
  }
}
