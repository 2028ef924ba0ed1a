package graft.operators

import graft.functions.{Scored, TopKBySim, VectorFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an `array<float>`
  * embedding column (north-star extension — SURVEY.md §7.6).
  *
  * Scale shape: the query set is broadcast (small side), the corpus
  * streams through a broadcast join with a codegen'd cosine — at 100 TB
  * the corpus never shuffles for scoring; the per-query top-k reduces
  * map-side through a k-bounded Aggregator (ObjectHashAggregate partial
  * merge), so only k rows per partition per query reach the exchange.
  */
object Similarity {

  /** Deterministic sign random projection (the Achlioptas/JL sparse
    * family): out[j] = Σ_i q[i]·sign(i, j), where q is the embedding
    * 1e-3-quantized to integers (`floor(v·1000)` — float→double
    * widening and floor are IEEE-identical in any engine, so the whole
    * projection is EXACT integer arithmetic, hash-gradeable with no
    * float-order caveats) and sign(i, j) ∈ {−1, +1} comes from one LCG
    * step on the flattened (i, j) index — replayable in plain SQL.
    *
    * This is the dimensionality-reduction front of an ANN stack at
    * 100 TB: project 1536-d vectors to `outDim` BEFORE the index, and
    * the distance distortion is the JL bound while the index shrinks
    * ~d/outDim×. Shape: per-row in-row fold, O(d·outDim) arithmetic,
    * ZERO shuffles — the corpus never moves. Output: (idCol, j, v) one
    * row per output coordinate (scalar rows grade cross-engine without
    * array-repr pitfalls).
    */
  def signProject(df: DataFrame, idCol: String, vecCol: String,
                  outDim: Int): DataFrame = {
    require(outDim >= 1 && outDim <= 4096, s"bad outDim=$outDim")
    val q = transform(col(vecCol),
      v => floor(v.cast("double") * 1000).cast("long"))
    // sign(i, j): LCG → xorshift → LCG → xorshift on the flattened
    // index, bit 12 decides. The xor steps are load-bearing: a PURE
    // LCG is linear in the seed, so the stride-outDim seeds of one
    // output coordinate produce lattice-correlated signs and the
    // projection norm biases ~25% low (measured); the xors break the
    // linearity and the JL norm ratio re-centers on 1 (spec-pinned).
    // Every op (31-bit mod, xor, shifts) is exactly replayable in SQL
    // with no Long overflow (max product < 2^61).
    def sign(i: Column, j: Column): Column = {
      val h1 = pmod((i * outDim + j + 1L) * 1103515245L + 12345L,
        lit(2147483648L))
      val h2 = h1.bitwiseXOR(shiftright(h1, 13))
      val h3 = pmod(h2 * 69069L + 1L, lit(2147483648L))
      val h4 = h3.bitwiseXOR(shiftright(h3, 7))
      lit(1L) - lit(2L) * pmod(shiftright(h4, 12), lit(2L))
    }
    // the (value, index) zip builds ONCE per row — the per-coordinate
    // folds (all interpreted higher-order functions) then only read it,
    // instead of re-zipping outDim times per row
    val proj = transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(col("_qi"), lit(0L),
        (acc, x) => acc + x.getField("v") * sign(x.getField("i"), j)))
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), q.as("_q"))
      .select(col(idCol),
        zip_with(col("_q"), sequence(lit(0L), size(col("_q")) - 1),
          (v, i) => struct(v.as("v"), i.as("i"))).as("_qi"))
      .select(col(idCol), posexplode(proj).as(Seq("j", "v")))
  }

  /** (qid, nid, sim) -> per-query top-k (qid, nid, sim, rnk), ranked by
    * (sim desc, nid asc). Map-side bounded via the native
    * `TopKSimAgg` TypedImperativeAggregate (zero per-row allocation; the
    * `TopKBySim` udaf form stays as the pinned-equal reference —
    * TopKAggSpec).
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val topk = ColumnBridge.column(
      graft.expressions.TopKSimAgg(
        ColumnBridge.expressionEager(col("sim")),
        ColumnBridge.expressionEager(col("nid")), k).toAggregateExpression())
    scored.groupBy(col("qid"))
      .agg(topk.as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), col("s.nid").as("nid"), col("s.sim").as("sim"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Exact brute-force top-k by cosine. `queries` must be small enough to
    * broadcast (it is hinted); ties broken by neighbor id.
    * Output: qid, nid, sim (raw double — bit-reproducible), rnk.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("sim", graft.expressions.CosineSim(col("qvec"), col("nvec")))
      .select(col("qid"), col("nid"), col("sim"))
    topKPerQuery(scored, k)
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k most-similar corpus vectors with a DIFFERENT
    * label — the negatives that actually teach an embedding model its
    * margin (uniformly random negatives are trivially distant at
    * scale, so their gradient vanishes). Same broadcast-queries ×
    * corpus scan + bounded top-k aggregate as [[bruteForceTopK]]; the
    * label inequality rides the join condition, so same-class pairs
    * never reach the scorer. At 100 TB the corpus side swaps for the
    * IVF/LSH-pruned candidate stream ([[ivfTopK]], [[lshBucketTopK]])
    * with the same label filter.
    */
  /** Late-interaction retrieval (the ColBERT MaxSim scorer, Khattab &
    * Zaharia 2020): query and corpus documents are BAGS of token
    * vectors; score(q, d) = Σ_{qt∈q} max_{dt∈d} cosine(qt, dt). Unlike
    * single-vector retrieval (bruteForceTopK), a query token matches
    * its best-aligned document token independently — the scoring that
    * rewards partial/term-level matches a pooled embedding averages
    * away.
    *
    * Scale shape: the query token table broadcasts (queries are few);
    * ONE pass over the corpus token table scores every (qtok, dtok)
    * pair with the codegen'd cosine, then two hash aggs — max per
    * (query, doc, qtok), sum per (query, doc) — both map-side
    * combined. No corpus self-join, no per-doc collect. The final
    * per-query top-k is the bounded TopKSimAgg. Scores are
    * stableRound'ed (the Σ over query tokens is accumulation-order-
    * dependent; each cosine itself is a fixed-order fold, bit-identical
    * cross-engine).
    */
  def maxSimTopK(queryTok: DataFrame, corpusTok: DataFrame, k: Int,
                 docCol: String = "doc", tokCol: String = "tok",
                 vecCol: String = "embedding"): DataFrame = {
    val q = queryTok.select(col(docCol).as("qid"), col(vecCol).as("qvec"),
      col(tokCol).as("_qt"))
    val c = corpusTok.select(col(docCol).as("nid"), col(vecCol).as("nvec"))
    val best = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("s", graft.expressions.CosineSim(col("qvec"), col("nvec")))
      .groupBy(col("qid"), col("nid"), col("_qt"))
      .agg(max(col("s")).as("best"))
    val scored = best.groupBy(col("qid"), col("nid"))
      .agg(graft.functions.NumFns.stableRound(sum(col("best")), 6).as("sim"))
    topKPerQuery(scored, k)
  }

  def hardNegativeTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      col(labelCol).as("qlab"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      col(labelCol).as("nlab"))
    val scored = c.join(broadcast(q),
        col("qid") =!= col("nid") && col("qlab") =!= col("nlab"))
      .withColumn("sim", graft.expressions.CosineSim(col("qvec"), col("nvec")))
      .select(col("qid"), col("nid"), col("sim"))
    topKPerQuery(scored, k)
  }

  /** ANN quality evaluation: per-query recall@k of an approximate
    * result set against the exact truth — the eval loop every
    * production vector pipeline runs before trading recall for speed
    * (rule of thumb: tune nProbe/nBits until recall@k plateaus, then
    * ship). Generic over any two (qid, nid) result sets, so the same
    * harness grades IVF, LSH, PQ-ADC, or a re-ranked hybrid. One
    * equi-join on (qid, nid) + a query-keyed count; queries missing
    * entirely from `approx` surface as recall 0, not as dropped rows.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"bad k $k")
    val hits = approx.select(col("qid"), col("nid"))
      .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      // int/int division — bit-stable raw
      .withColumn("recall", col("n_hits").cast("double") / k)
  }

  /** IVF-style ANN: corpus vectors are assigned to the nearest of
    * `nCells` coarse centroids (deterministic seeds: the first nCells
    * corpus vectors by id — no RNG, reproducible); each query probes its
    * `nProbe` nearest cells and scores only those cells' members.
    *
    * The centroid table is O(nCells · dim) by construction, so it is
    * collected once and inlined as constant array literals: corpus→cell
    * assignment becomes a pure per-row argmin projection — zero shuffle,
    * zero join — instead of a crossJoin + rank window (which would
    * shuffle corpus × nCells rows just to compute an argmin). The probe
    * side joins the tiny exploded (query, cell) set by broadcast, and
    * the inverted-file pruning drops (nCells - nProbe)/nCells of the
    * corpus from every query before scoring.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              centroids: Option[Array[(Long, Seq[Double])]] = None): DataFrame = {
    // coarse centroids: caller-provided (e.g. KMeans.fit for real
    // partition quality) or the deterministic default — the first
    // nCells corpus vectors by id
    val cents: Array[(Long, Seq[Double])] =
      centroids.getOrElse(ivfSeedCentroids(corpus, idCol, vecCol, nCells))
    ivfTopKAssigned(queries, ivfAssign(corpus, idCol, vecCol, cents),
      k, cents, nProbe, idCol, vecCol)
  }

  /** The deterministic coarse-centroid default: the first `nCells`
    * corpus vectors by id, collected (O(nCells·dim) — a model
    * parameter, like the PQ codebooks).
    */
  def ivfSeedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                       nCells: Int): Array[(Long, Seq[Double])] =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).cast("long"),
        graft.functions.VectorFns.toDoubleArr(col(vecCol)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Per-row (neg-sim, cell) structs, ascending sort => best cell
    * first; ties break on the smaller cell id (same order a rank
    * window would use).
    */
  private def cellsByAffinity(vec: Column,
                              cents: Array[(Long, Seq[Double])]): Column =
    array_sort(array(cents.map { case (cid, v) =>
      struct((-graft.expressions.CosineSim(vec, typedlit(v))).as("neg"),
        lit(cid).as("cell"))
    }: _*))

  /** Assign vectors to their nearest centroid: one shuffle-free argmin
    * projection. Output: (nid, nvec, cell) — the inverted-file table a
    * persisted IVF index stores ([[VectorIndex.buildIvf]]).
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                cents: Array[(Long, Seq[Double])]): DataFrame =
    df.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("cell",
        element_at(cellsByAffinity(col("nvec"), cents), 1).getField("cell"))

  /** IVF search over an ALREADY-ASSIGNED inverted-file table (freshly
    * assigned by [[ivfTopK]] or read back from a persisted index):
    * queries probe their nProbe nearest cells, the corpus side joins by
    * broadcast on the cell key and only probed cells' members score.
    */
  def ivfTopKAssigned(queries: DataFrame, corpusCells: DataFrame, k: Int,
                      cents: Array[(Long, Seq[Double])], nProbe: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val queryCells = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(transform(
        slice(cellsByAffinity(col("qvec"), cents), 1, nProbe),
        s => s.getField("cell"))))
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", graft.expressions.CosineSim(col("qvec"), col("nvec")))
      .select(col("qid"), col("nid"), col("sim"))
    topKPerQuery(scored, k)
  }

  /** ANN over PQ-compressed vectors with asymmetric distance (ADC):
    * the corpus exists only as m-byte PQ codes ([[Quantize.pqEncode]]),
    * queries stay full-precision. Each query precomputes an m × cells
    * lookup table of squared distances from its sub-vectors to every
    * codebook centroid — ONE O(dim · cells) evaluation per query row —
    * and each (query, code) pair then costs just m table lookups + adds
    * (accumulated in sub-space order, so the oracle's j-ordered fold
    * matches bit-for-bit).
    *
    * Scale shape: queries (with their LUTs) broadcast; the coded corpus
    * — 16-64x smaller than the raw floats, the reason PQ exists —
    * streams through the broadcast join without shuffling, and the
    * per-query top-k reduces map-side through the bounded TopKSimAgg.
    * Recall vs exact search is pinned in SimilaritySpec.
    */
  def pqAdcTopK(queries: DataFrame, corpusCodes: DataFrame, k: Int,
                books: Array[Array[(Long, Seq[Double])]],
                qidCol: String = "vec_id", vecCol: String = "embedding",
                nidCol: String = "vec_id", codesCol: String = "codes"): DataFrame = {
    val m = books.length
    val sub = books.head.head._2.length
    val lutExpr = array(books.zipWithIndex.map { case (book, j) =>
      val sv = slice(col("qvec"), j * sub + 1, sub)
      array(book.sortBy(_._1).map { case (_, cv) =>
        aggregate(zip_with(sv, typedlit(cv), (x, c) => (x - c) * (x - c)),
          lit(0.0), (s, d) => s + d)
      }: _*)
    }: _*)
    val q = queries
      .select(col(qidCol).as("qid"), VectorFns.toDoubleArr(col(vecCol)).as("qvec"))
      .withColumn("lut", lutExpr)
      .select(col("qid"), col("lut"))
    val c = corpusCodes.select(col(nidCol).as("nid"), col(codesCol).as("ncodes"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dist", (0 until m).map(j =>
          element_at(element_at(col("lut"), j + 1),
            element_at(col("ncodes"), j + 1) + 1))
        .reduce(_ + _))
      .select(col("qid"), col("nid"), (-col("dist")).as("sim"))
    topKPerQuery(scored, k)
      .select(col("qid"), col("nid"), (-col("sim")).as("dist"), col("rnk"))
  }

  /** ANN over SQ8-compressed vectors, asymmetric: the corpus exists only
    * as byte codes ([[Quantize.scalarQuantize]]), queries stay
    * full-precision; each pair dequantizes the codes on the fly
    * ([[Quantize.sq8Reconstruct]], codegen'd) and scores codegen'd
    * cosine — the 4x-smaller scan FAISS-style SQ8 search pays O(dim)
    * per pair for. Same broadcast/bounded-top-k shape as [[pqAdcTopK]].
    */
  def sq8AdcTopK(queries: DataFrame, corpusCodes: DataFrame, k: Int,
                 book: Array[(Double, Double)],
                 qidCol: String = "vec_id", vecCol: String = "embedding",
                 nidCol: String = "vec_id", codesCol: String = "codes"): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"),
      VectorFns.toDoubleArr(col(vecCol)).as("qvec"))
    val c = corpusCodes.select(col(nidCol).as("nid"),
      Quantize.sq8Reconstruct(col(codesCol), book).as("rvec"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("sim", graft.expressions.CosineSim(col("qvec"), col("rvec")))
      .select(col("qid"), col("nid"), col("sim"))
    topKPerQuery(scored, k)
  }

  /** The hyperplane-LSH bucket signature as a Column: bit b of the
    * result is the sign of the projection of `vec` onto plane b, plane
    * component (b, i) = ((1103515245·(97b + i) + 12345) mod 4001) − 2000
    * — plain integer arithmetic, no RNG state, no engine hash, so the
    * signature replays bit-for-bit anywhere (the SQL oracle mirror is
    * SqlFragments.lshBucketExpr). Shared by the ANN probe
    * (lshBucketTopK) and the label-free embedding near-dup
    * (Dedup.embeddingNearDupLsh).
    */
  def lshSignature(vec: Column, nBits: Int): Column =
    (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(VectorFns.toDoubleArr(vec),
          sequence(lit(0), size(vec) - 1),
          (x, i) => x * (pmod(lit(1103515245L) * (lit(97L * b) + i) + lit(12345L), lit(4001L))
            .cast("double") - lit(2000.0))),
        lit(0.0), (s, v) => s + v)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: hyperplane signatures (lshSignature) bucket the
    * corpus; only same-bucket pairs are scored. Trades recall for a
    * shuffle-free probe at scale: queries are broadcast, so the corpus
    * side never shuffles.
    */
  def lshBucketTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    nBits: Int = 12, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("bucket", lshSignature(col("qvec"), nBits))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("bucket", lshSignature(col("nvec"), nBits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", graft.expressions.CosineSim(col("qvec"), col("nvec")))
      .select(col("qid"), col("nid"), col("sim"))
    topKPerQuery(scored, k)
  }
}
