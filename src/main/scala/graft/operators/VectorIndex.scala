package graft.operators

import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted ANN index lifecycle — the production split the per-query
  * quantized searches (q90/q94/q97) lack: a vector pipeline fits the
  * codebooks ONCE, encodes the corpus ONCE, stores both, and then
  * serves many searches (and incremental appends) from the stored
  * index without ever re-fitting. Exactly the fingerprint-snapshot
  * shape [[IncrementalDedup]] proves for dedup, applied to PQ search:
  *
  *  - [[buildPq]]: fit ([[Quantize.pqCodebooks]]) + encode
  *    ([[Quantize.pqEncode]]) + commit codebooks and codes as two
  *    [[SnapshotStore]] views — codes carry per-dir `vec_id` min/max
  *    stats, so point lookups and merges skip dirs;
  *  - [[appendPq]]: encode a NEW batch with the FROZEN stored
  *    codebooks and land it via `appendOnce` — idempotent under
  *    foreachBatch redelivery, and O(batch), never O(corpus);
  *  - [[searchPq]]: ADC top-k ([[Similarity.pqAdcTopK]]) served from
  *    the stored codes at any pinned version — a search planned
  *    against v1 is isolated from appends landing afterwards
  *    (manifest resolution, not directory listing).
  *
  * At 100 TB: the codebooks are O(m·k·dim/m) = O(k·dim) doubles (a
  * model parameter, broadcast), the coded corpus is 16-64x smaller
  * than the floats, and an append re-encodes only its batch. The
  * fit set can be a sample of the corpus; encode/search never require
  * re-fitting, so index maintenance is incremental by construction.
  */
object VectorIndex {

  private def booksView(prefix: String) = s"${prefix}_books"
  private def codesView(prefix: String) = s"${prefix}_codes"

  /** Fit PQ codebooks on `fitSet` (m sub-spaces, k cells, the stable
    * Lloyd trajectory of [[Quantize.pqCodebooks]]), encode `corpus`,
    * and commit both into the store: `<prefix>_books` (j, cell,
    * centroid) and `<prefix>_codes` (vec_id, codes) with `vec_id`
    * skipping stats. Returns the committed codes version (v1 of the
    * index lifecycle).
    */
  def buildPq(store: SnapshotStore, prefix: String,
              fitSet: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String,
              m: Int, k: Int, iterations: Int = 1): Long = {
    val books = Quantize.pqCodebooks(fitSet, idCol, vecCol, m, k, iterations)
    val spark = corpus.sparkSession
    import spark.implicits._
    val bookRows = for {
      (book, j) <- books.zipWithIndex.toSeq
      (cell, cv) <- book
    } yield (j, cell, cv)
    store.commit(booksView(prefix), bookRows.toDF("j", "cell", "centroid"),
      overwrite = true)
    store.commit(codesView(prefix),
      Quantize.pqEncode(corpus, idCol, vecCol, books)
        .select(col(idCol).as("vec_id"), col("codes")),
      overwrite = true, statsCols = Seq("vec_id"))
  }

  /** The FROZEN codebooks read back from the store — O(k·dim) driver
    * rows, the same sanctioned model-parameter collect the fit itself
    * performs. Centroid doubles round-trip parquet exactly, so encode
    * and LUT arithmetic over loaded books is bit-identical to encode
    * over just-fit books.
    */
  def loadPqBooks(store: SnapshotStore, prefix: String): Array[Array[(Long, Seq[Double])]] =
    store.read(booksView(prefix)).orderBy(col("j"), col("cell")).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Double](2))))
      .groupBy(_._1).toArray.sortBy(_._1).map(_._2.map(_._2))

  /** Encode `newVecs` with the frozen stored codebooks and append them
    * exactly once under `txnId` (None when the txn already landed — a
    * redelivered foreachBatch retry converges instead of duplicating
    * index entries). The codebooks are never re-fit: an index serves
    * consistent distances across its whole lifetime.
    */
  def appendPq(store: SnapshotStore, prefix: String, newVecs: DataFrame,
               idCol: String, vecCol: String, txnId: Long): Option[Long] = {
    val books = loadPqBooks(store, prefix)
    store.appendOnce(codesView(prefix),
      Quantize.pqEncode(newVecs, idCol, vecCol, books)
        .select(col(idCol).as("vec_id"), col("codes")),
      txnId, statsCols = Seq("vec_id"))
  }

  /** ADC top-k served from the STORED index: codes read at `asOf`
    * (latest when None — the manifest is resolved here, so the search
    * is isolated from concurrent appends), codebooks loaded frozen,
    * then [[Similarity.pqAdcTopK]]'s broadcast-LUT search.
    */
  def searchPq(store: SnapshotStore, prefix: String, queries: DataFrame,
               k: Int, asOf: Option[Long] = None,
               qidCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.pqAdcTopK(queries, store.read(codesView(prefix), asOf), k,
      loadPqBooks(store, prefix), qidCol, vecCol)

  // ------------------------------------------------- IVF index lifecycle

  private def centsView(prefix: String) = s"${prefix}_cents"
  private def cellsView(prefix: String) = s"${prefix}_cells"

  /** Fit IVF coarse centroids on `fitSet` (the deterministic first-
    * nCells seeds of [[Similarity.ivfSeedCentroids]]), assign `corpus`
    * to cells, and commit both: `<prefix>_cents` (cell, centroid) and
    * `<prefix>_cells` (nid, nvec, cell) — the persisted inverted file.
    * Returns the committed cells version.
    */
  def buildIvf(store: SnapshotStore, prefix: String,
               fitSet: DataFrame, corpus: DataFrame,
               idCol: String, vecCol: String, nCells: Int): Long = {
    val cents = Similarity.ivfSeedCentroids(fitSet, idCol, vecCol, nCells)
    val spark = corpus.sparkSession
    import spark.implicits._
    store.commit(centsView(prefix), cents.toSeq.toDF("cell", "centroid"),
      overwrite = true)
    store.commit(cellsView(prefix),
      Similarity.ivfAssign(corpus, idCol, vecCol, cents), overwrite = true)
  }

  /** The frozen coarse centroids read back — O(nCells·dim). */
  def loadIvfCents(store: SnapshotStore, prefix: String): Array[(Long, Seq[Double])] =
    store.read(centsView(prefix)).orderBy(col("cell")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Assign `newVecs` to the FROZEN stored centroids and append the
    * inverted-file rows exactly once under `txnId` — cells never move
    * after build, so the index stays consistent across appends.
    */
  def appendIvf(store: SnapshotStore, prefix: String, newVecs: DataFrame,
                idCol: String, vecCol: String, txnId: Long): Option[Long] =
    store.appendOnce(cellsView(prefix),
      Similarity.ivfAssign(newVecs, idCol, vecCol, loadIvfCents(store, prefix)),
      txnId)

  /** IVF probe search served from the STORED inverted file at `asOf`. */
  def searchIvf(store: SnapshotStore, prefix: String, queries: DataFrame,
                k: Int, nProbe: Int, asOf: Option[Long] = None,
                qidCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.ivfTopKAssigned(queries, store.read(cellsView(prefix), asOf),
      k, loadIvfCents(store, prefix), nProbe, qidCol, vecCol)
}
