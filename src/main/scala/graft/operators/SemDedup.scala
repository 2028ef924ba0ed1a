package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup shape
  * (cluster first, then prune near-duplicates only WITHIN a cluster).
  * The reference has no embedding curation at all; this is the
  * north-star operator (SURVEY.md §7.6) a 100 TB training corpus runs
  * after exact/MinHash dedup: documents that say the same thing in
  * different words share no shingles, but their embeddings are close.
  *
  * Why cluster first: all-pairs cosine is O(N²) and un-shardable. A
  * k-cell Lloyd partition turns it into k independent in-cell problems
  * — at 100 TB, k scales with the corpus (k ≈ N / target_cell_size,
  * SemDeDup uses ~N/100) so the per-cell quadratic work stays constant
  * while the cells parallelize perfectly across executors.
  *
  * Scale shape: the codebook fit is [[Quantize.pqCodebooks]] with m = 1
  * (per-row argmin projection + one k×dim hash aggregate per iteration;
  * only the k×dim centroid doubles reach the driver). Assignment is the
  * same zero-shuffle argmin, then ONE shuffle on the cell key groups
  * each cell into a single row and the duplicate test runs inside that
  * row (the q64 in-bucket expansion — no self-join, so the corpus is
  * scanned and assigned exactly once).
  *
  * Duplicate rule (deterministic, oracle-replayable): a member is a
  * duplicate iff ANY lower-id member of the same cell has cosine ≥
  * `simThreshold` against it. The ∃-any-earlier form (rather than
  * greedy-against-survivors) makes the verdict a pure function of the
  * pair set, so a SQL oracle can replay it with one in-cell join.
  *
  * The deterministic Lloyd trajectory (first-k-by-id seeds,
  * stableRound'ed means — [[Quantize.pqCodebooks]]) makes the whole
  * pipeline — centroids, assignment, in-cell sims, survivor set —
  * bit-replayable from the raw table.
  */
object SemDedup {

  /** @param k     number of Lloyd cells (scale with corpus size so
    *              expected cell size stays bounded; see scaladoc)
    * @param simThreshold in-cell cosine at/above which the higher-id
    *              member is dropped
    * @return survivors only: (idCol, cell, n_cell) — cell is the Lloyd
    *         cell id, n_cell its total member count before pruning
    */
  def dedup(df: DataFrame, idCol: String, vecCol: String,
            k: Int, simThreshold: Double, iterations: Int = 1): DataFrame = {
    val book = Quantize.pqCodebooks(df, idCol, vecCol,
      m = 1, k = k, iterations = iterations).head
    val data = df.select(col(idCol).as("id"),
      VectorFns.toDoubleArr(col(vecCol)).as("_v"))
    // zero-shuffle assignment: argmin over the inlined centroid
    // literals, ties to the lower cell (the pqEncode shape)
    val scored = array_sort(array(book.map { case (cid, cv) =>
      struct(
        aggregate(zip_with(col("_v"), typedlit(cv), (x, c) => (x - c) * (x - c)),
          lit(0.0), (s, d) => s + d).as("d"),
        lit(cid).as("cell"))
    }: _*))
    val assigned = data.withColumn("cell",
      element_at(scored, 1).getField("cell"))
    // one shuffle on the cell key; members sorted by id inside the row
    // (struct sort; ids are unique) so "earlier" == lower id
    val cells = assigned.groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("id"), col("_v").as("v")))).as("ms"))
    // survivor = no lower-id member of the cell within simThreshold;
    // singleton cells pass through untouched (a dropped-cell guard like
    // q64's would delete documents — wrong for dedup)
    val survivors = filter(col("ms"), (y, j) =>
      size(filter(slice(col("ms"), lit(1), j), x =>
        graft.expressions.CosineSim(x.getField("v"), y.getField("v")) >= simThreshold
      )) === 0)
    cells.select(col("cell"), size(col("ms")).cast("long").as("n_cell"),
        explode(survivors).as("s"))
      .select(col("s.id").as(idCol), col("cell"), col("n_cell"))
  }
}
