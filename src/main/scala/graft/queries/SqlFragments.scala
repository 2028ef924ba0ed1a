package graft.queries

import graft.functions.{SentimentFns, TextFns}

/** Shared DuckDB SQL fragments kept in lockstep with the Scala column
  * functions they mirror (TextFns / SentimentFns). Any change to the Scala
  * side must change these, or the oracle diverges.
  */
object SqlFragments {

  /** DuckDB list literal from a word list. */
  def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB mirror of NumFns.stableRound: 15-significant-digit print +
    * decimal parse (HALF_UP). Use for order-dependent aggregate doubles.
    */
  def r15(expr: String, scale: Int): String =
    s"CAST(CAST(printf('%.15g', $expr) AS DECIMAL(38,$scale)) AS DOUBLE)"

  /** DuckDB cosine mirroring VectorFns.cosine op-for-op (same fold order,
    * same double ops => bit-identical): dot / sqrt(norm2a * norm2b).
    * Operands must be DOUBLE[] expressions.
    */
  def cosineExpr(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(range(1, len($x) + 1), i -> $x[i] * $y[i]), (u, v) -> u + v)"
    s"(${dot(a, b)} / sqrt(${dot(a, a)} * ${dot(b, b)}))"
  }

  /** DuckDB squared-L2 distance mirroring KMeans.distTo("l2") op-for-op
    * (same left-to-right fold of (x-c)^2, starting from the first
    * element — 0.0 + d == d for the non-negative squares, so the fold
    * matches Spark's 0.0-seeded `aggregate` bit-for-bit). Operands must
    * be DOUBLE[] expressions.
    */
  def l2sqExpr(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (u, v) -> u + v)"

  /** Unrolled DuckDB replay of [[graft.operators.Bpe.trainMerges]]:
    * `rounds` BPE merge rounds over the distinct-word table of
    * `documents`. Each round: adjacent-pair counts weighted by word
    * frequency, top-1 by (n desc, p1, p2), then the left-to-right
    * non-overlapping merge — as a string fold with a chr(31) symbol
    * separator (ends_with over the separator-prefixed accumulator
    * makes the last-symbol test unambiguous, and a just-merged
    * element `p1||p2` can never re-match `p1`, mirroring the Spark
    * fold exactly). Ends with tp1..tpN (round winners) in scope.
    */
  def bpeTrainCte(rounds: Int): String = {
    val base =
      s"""WITH t0 AS (SELECT unnest($toksExpr) AS w
                      FROM documents WHERE text IS NOT NULL),
          w0 AS (SELECT w AS word, COUNT(*) AS freq,
                 list_transform(range(1, length(w) + 1), i -> substring(w, i, 1)) AS s
                 FROM t0 GROUP BY w)"""
    val perRound = (1 to rounds).map { r =>
      s""",
          pc$r AS (SELECT s[i] AS p1, s[i + 1] AS p2, CAST(SUM(freq) AS BIGINT) AS n
                   FROM (SELECT freq, s, unnest(range(1, len(s))) AS i
                         FROM w${r - 1} WHERE len(s) >= 2)
                   GROUP BY 1, 2),
          tp$r AS (SELECT p1, p2, n FROM pc$r ORDER BY n DESC, p1, p2 LIMIT 1),
          w$r AS (SELECT word, freq,
                  list_filter(string_split(
                    list_reduce(list_prepend('', s), (acc, x) ->
                      CASE WHEN x = t.p2 AND ends_with(acc, chr(31) || t.p1)
                           THEN left(acc, length(acc) - length(t.p1) - 1)
                                || chr(31) || t.p1 || t.p2
                           ELSE acc || chr(31) || x END),
                    chr(31)), y -> y <> '') AS s
                  FROM w${r - 1}, tp$r t)"""
    }.mkString
    base + perRound
  }

  /** Shared WITH prefix replaying Quantize.pqCodebooks' 1-iteration
    * Lloyd trajectory over `embeddings` plus the final PQ assignment:
    * `m` sub-spaces of `sub` dims, `cells` seeds (first ids), seed
    * argmin, r15(SUM/COUNT) means (the stableRound mirror), empty-cell
    * seed fallback, and the final per-(vec, sub-space) assignment `a2`
    * (vec_id, j, cell, d). `fitWhere` restricts the FIT set (seeds +
    * mean aggregation) while `a2` still assigns EVERY vector against
    * the fitted centroids — the frozen-codebook encode of the q148
    * index lifecycle. Used by the q90 (codes) and q94 (ADC search)
    * oracles.
    */
  def pqLloydCte(m: Int, sub: Int, cells: Int,
                 fitWhere: String = "TRUE"): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sv AS (SELECT vec_id, j, list_slice(v, j * $sub + 1, (j + 1) * $sub) AS sv
               FROM e, range(0, $m) t(j)),
        svf AS (SELECT * FROM sv WHERE $fitWhere),
        sk AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell
               FROM (SELECT vec_id FROM e WHERE $fitWhere
                     ORDER BY vec_id LIMIT $cells)),
        seeds AS (SELECT s.j, k.cell, s.sv FROM sv s JOIN sk k USING (vec_id)),
        aff0 AS (SELECT s.vec_id, s.j, c.cell,
                 ${l2sqExpr("s.sv", "c.sv")} AS d
                 FROM svf s JOIN seeds c ON s.j = c.j),
        a1 AS (SELECT vec_id, j, cell FROM
               (SELECT vec_id, j, cell,
                ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, cell) AS rn
                FROM aff0) WHERE rn = 1),
        mx AS (SELECT a.j, a.cell, t.i,
               ${r15(s"SUM(s.sv[t.i]) / COUNT(*)", 9)} AS c
               FROM a1 a JOIN svf s USING (vec_id, j), range(1, ${sub + 1}) t(i)
               GROUP BY a.j, a.cell, t.i),
        cb AS (SELECT j, cell, list(c ORDER BY i) AS cv FROM mx GROUP BY j, cell),
        cents AS (SELECT s.j, s.cell, COALESCE(cb.cv, s.sv) AS cv
                  FROM seeds s LEFT JOIN cb ON s.j = cb.j AND s.cell = cb.cell),
        aff1 AS (SELECT s.vec_id, s.j, c.cell,
                 ${l2sqExpr("s.sv", "c.cv")} AS d
                 FROM sv s JOIN cents c ON s.j = c.j),
        a2 AS (SELECT vec_id, j, cell, d FROM
               (SELECT vec_id, j, cell, d,
                ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, cell) AS rn
                FROM aff1) WHERE rn = 1)"""

  /** Shared WITH prefix replaying Dedup.repeatedSpans over `documents`:
    * k-gram anchors by position (1-based i -> 0-based pos), global
    * 2..maxBucket occurrence cap, cross-doc pairs, equal-offset
    * gaps-and-islands runs. Ends with `spans` (a_doc, b_doc, a_start,
    * b_start, span_toks >= minSpan) and keeps `t` (doc_id, toks) in
    * scope. Used by the q91 (detection) and q99 (removal) oracles.
    */
  def repeatedSpansCte(k: Int, minSpan: Int, maxBucket: Int): String =
    s"""WITH t AS (SELECT doc_id, $toksExpr AS toks
                   FROM documents WHERE text IS NOT NULL),
        anch AS (SELECT doc_id, i - 1 AS pos,
                 array_to_string(list_slice(toks, i, i + ${k - 1}), ' ') AS gram
                 FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - $k + 2)) AS i
                       FROM t)),
        keep AS (SELECT gram FROM anch GROUP BY gram
                 HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
        a2 AS (SELECT anch.* FROM anch JOIN keep USING (gram)),
        p AS (SELECT a.doc_id AS a_doc, b.doc_id AS b_doc,
              a.pos - b.pos AS diff, a.pos AS a_pos
              FROM a2 a JOIN a2 b ON a.gram = b.gram AND a.doc_id < b.doc_id),
        r AS (SELECT a_doc, b_doc, diff, a_pos,
              a_pos - ROW_NUMBER() OVER (PARTITION BY a_doc, b_doc, diff
                                         ORDER BY a_pos) AS grp FROM p),
        spans AS (SELECT a_doc, b_doc, a_start, b_start, span_toks FROM
              (SELECT a_doc, b_doc, CAST(MIN(a_pos) AS BIGINT) AS a_start,
               CAST(MIN(a_pos) - diff AS BIGINT) AS b_start,
               CAST(COUNT(*) + $k - 1 AS BIGINT) AS span_toks
               FROM r GROUP BY a_doc, b_doc, diff, grp)
              WHERE span_toks >= $minSpan)"""

  /** toks CTE body: whitespace tokens of lowercased text, empties dropped
    * — mirrors TextFns.tokens.
    */
  val toksExpr: String =
    """list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0)"""

  /** Per-doc sentiment SQL over `documents` mirroring
    * SentimentFns.sentiment with the default lexicons, columns
    * (doc_id, posCol, negCol, neuCol). Raw doubles: the arithmetic is
    * integer-derived and identical in both engines, so values are
    * bit-equal without rounding.
    */
  def sentimentSql(posCol: String, negCol: String, neuCol: String): String = {
    val pos = sqlList(SentimentFns.DefaultPositive)
    val neg = sqlList(SentimentFns.DefaultNegative)
    s"""WITH t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
        c AS (SELECT doc_id,
              CAST(len(toks) AS DOUBLE) AS n,
              CAST(len(list_filter(toks, x -> list_contains($pos, x))) AS DOUBLE) AS pc,
              CAST(len(list_filter(toks, x -> list_contains($neg, x))) AS DOUBLE) AS nc
              FROM t)
        SELECT doc_id,
          (pc + 1.0) / (n + 3.0) AS $posCol,
          (nc + 1.0) / (n + 3.0) AS $negCol,
          (n - pc - nc + 1.0) / (n + 3.0) AS $neuCol
        FROM c"""
  }

  /** Clean-text SQL mirroring TextFns.cleanText minus the emoji class
    * (the corpus is ASCII; the emoji regexp is a no-op on it).
    */
  val cleanExpr: String =
    """TRIM(REPLACE(REPLACE(REPLACE(
         REGEXP_REPLACE(REGEXP_REPLACE(text, '(?:@|http://|https://|www)\S+', '', 'g'),
                        '@[A-Za-z0-9]+', '', 'g'),
         '$', ''), '#', ''), '_', ' '))"""

  /** Word-bigram shingles from a token-list expression — mirrors
    * TextFns.shinglesFromTokens(_, 2). Shared by every oracle that
    * shingles (q22, q47, ...), so shingle-semantics changes happen once.
    */
  def bigramsExpr(toksSql: String): String =
    s"list_transform(range(1, len($toksSql)), i -> $toksSql[i] || ' ' || $toksSql[i + 1])"

  /** Marker-hit count mirroring TextFns.markerHits. */
  def markerHitsExpr(words: Seq[String]): String =
    s"len(list_filter(toks, x -> list_contains(${sqlList(words)}, x)))"

  def langMarkers: Map[String, Seq[String]] = TextFns.LangMarkers

  /** DuckDB mirror of Similarity.lshBucketTopK's hyperplane signature:
    * bit b set iff sum_i vec[i] * plane(b, i) >= 0 with plane(b, i) =
    * ((1103515245 * (97b + i) + 12345) mod 4001) - 2000 — plain integer
    * arithmetic replayed with the identical left-to-right fold, so the
    * bucket ids are bit-equal across engines. `vecSql` must be a
    * DOUBLE[] expression.
    */
  def lshBucketExpr(vecSql: String, nBits: Int): String = {
    def proj(b: Int) =
      s"list_reduce(list_transform(range(1, len($vecSql) + 1), " +
        s"i -> $vecSql[i] * (CAST((1103515245 * (${97 * b} + (i - 1)) + 12345) % 4001 AS DOUBLE) - 2000.0)), " +
        "(u, v) -> u + v)"
    (0 until nBits).map(b => s"(CASE WHEN ${proj(b)} >= 0 THEN ${1L << b} ELSE 0 END)")
      .mkString("(", " + ", ")")
  }

  /** All-pairs exact near-dup verify over `documents` as a WITH prefix:
    * distinct-token and bigram-shingle sets per doc, every (a < b) pair,
    * `verified` = pairs with shingle Jaccard >= threshold. Mirrors
    * Dedup.lshVerifiedPairs' verify arithmetic exactly (int set sizes,
    * one double division). Quadratic by construction — an ORACLE device
    * for small sf, standing in for the LSH candidate stage, which this
    * checks for completeness above the threshold.
    */
  def shinglePairsCte(threshold: Double): String =
    "WITH " + shinglePairsBody(threshold)

  /** [[shinglePairsCte]] without the WITH prefix and with a
    * parameterized source relation — for oracles whose pair stage runs
    * over an earlier CTE (e.g. a gate pipeline's survivors) rather
    * than the whole documents table.
    */
  def shinglePairsBody(threshold: Double, src: String = "documents"): String =
    s"""tk AS (SELECT doc_id,
          list_distinct(${bigramsExpr(toksExpr)}) AS sh
          FROM $src WHERE text IS NOT NULL),
        pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM tk a JOIN tk b
          ON a.doc_id < b.doc_id AND len(list_concat(a.sh, b.sh)) > 0),
        verified AS (SELECT * FROM pairs WHERE jaccard >= $threshold)"""

  /** Unrolled DuckDB replay of [[graft.operators.Unigram.train]]: seed
    * substring vocab, then `emRounds` of Viterbi-E / count-prune-M over
    * the distinct-word table. The per-round Viterbi is a RECURSIVE CTE
    * over character positions (each row carries the DP arrays; the
    * position argmax is a struct max over (score, -start, piece) — ties
    * on score take the smallest start = longest piece, exactly the
    * Spark fold's strict-improvement scan), followed by a recursive
    * backpointer walk. Log-probs are r15/9-rounded in BOTH engines
    * before they enter the DP, so path sums add identical doubles in
    * identical order and every argmax decision replays bit-for-bit.
    *
    * Leaves in scope: uw0 (word, freq), uchars, v0..v`emRounds`
    * (piece, cnt, lp), vm0..vm`emRounds` (vocab maps), and per round r:
    * dp`r`/bt`r`/c`r` (the round's segmentation + piece counts). Pass
    * `applyRound = true` to add one more dp/bt/c pass (numbered
    * emRounds+1) segmenting under the FINAL vocab — the tokenizer-apply
    * half.
    */
  def unigramCte(maxLen: Int, seedSize: Int, vocabSize: Int,
                 emRounds: Int, applyRound: Boolean = false): String = {
    def viterbi(r: Int, vm: String): String =
      s""",
        dp$r AS (
          SELECT word, 0 AS pos, CAST([0.0] AS DOUBLE[]) AS bests,
                 CAST([-1] AS INT[]) AS bps, CAST([''] AS VARCHAR[]) AS pcs
          FROM uw0
          UNION ALL
          SELECT word, pos + 1, list_append(bests, best.s),
                 list_append(bps, CAST(-best.jneg AS INT)),
                 list_append(pcs, best.p)
          FROM (SELECT word, pos, bests, bps, pcs,
                  list_aggregate(list_filter(list_transform(
                      range(GREATEST(0, pos + 1 - $maxLen), CAST(pos + 1 AS BIGINT)),
                      j -> struct_pack(
                        s := bests[j + 1] +
                             element_at(m, substring(word, CAST(j + 1 AS INT),
                                                     CAST(pos + 1 - j AS INT)))[1],
                        jneg := -j,
                        p := substring(word, CAST(j + 1 AS INT),
                                       CAST(pos + 1 - j AS INT)))),
                    c -> c.s IS NOT NULL), 'max') AS best
                FROM dp$r, $vm WHERE pos < length(word))),
        bt$r AS (
          SELECT word, length(word) AS pos, bps, pcs,
                 CAST([] AS VARCHAR[]) AS out
          FROM dp$r WHERE pos = length(word)
          UNION ALL
          SELECT word, bps[pos + 1], bps, pcs, list_prepend(pcs[pos + 1], out)
          FROM bt$r WHERE pos > 0),
        c$r AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT word, unnest(out) AS piece
                      FROM bt$r WHERE pos = 0) s
                JOIN uw0 USING (word) GROUP BY piece)"""
    def rescore(src: String, v: String, vm: String): String =
      s""",
        $v AS (SELECT piece, cnt,
                 ${r15("ln(CAST(cnt AS DOUBLE) + 1.0) - ln(tot + nv)", 9)} AS lp
               FROM $src, (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot,
                                  CAST(COUNT(*) AS DOUBLE) AS nv FROM $src) t),
        $vm AS (SELECT map(list(piece ORDER BY piece),
                           list(lp ORDER BY piece)) AS m FROM $v)"""
    val base =
      s"""WITH RECURSIVE
        uw0 AS (SELECT w AS word, COUNT(*) AS freq
                FROM (SELECT unnest($toksExpr) AS w
                      FROM documents WHERE text IS NOT NULL) GROUP BY w),
        uchars AS (SELECT DISTINCT substring(word, CAST(i AS INT), 1) AS piece
                   FROM (SELECT word, unnest(range(1, length(word) + 1)) AS i
                         FROM uw0)),
        usub AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
                   SELECT freq, unnest(flatten(list_transform(
                     range(1, length(word) + 1), i ->
                       list_transform(range(i, LEAST(length(word), i + ${maxLen - 1}) + 1),
                         j -> substring(word, CAST(i AS INT),
                                        CAST(j - i + 1 AS INT)))))) AS piece
                   FROM uw0) GROUP BY piece),
        useed AS (SELECT DISTINCT piece, cnt FROM (
                    SELECT * FROM
                      (SELECT * FROM usub ORDER BY cnt DESC, piece LIMIT $seedSize)
                    UNION ALL
                    SELECT * FROM usub WHERE length(piece) = 1))""" +
        rescore("useed", "v0", "vm0")
    val rounds = (1 to emRounds).map { r =>
      viterbi(r, s"vm${r - 1}") +
        s""",
        k$r AS (SELECT DISTINCT piece, cnt FROM (
                  SELECT * FROM
                    (SELECT * FROM c$r ORDER BY cnt DESC, piece LIMIT $vocabSize)
                  UNION ALL
                  SELECT ch.piece, COALESCE(c.cnt, CAST(0 AS BIGINT)) AS cnt
                  FROM uchars ch LEFT JOIN c$r c USING (piece)))""" +
        rescore(s"k$r", s"v$r", s"vm$r")
    }.mkString
    val apply =
      if (applyRound) viterbi(emRounds + 1, s"vm$emRounds") else ""
    base + rounds + apply
  }

  /** DuckDB mirror of `Stats.relQuantiles` at subBits = 7 and
    * qs = (0.5, 0.9, 0.99): the integer sketch walk (bit-length log2
    * buckets, 128 linear sub-buckets, cumulative window, rank pick at
    * the EXACT ceil(q·n) — `(n·num + den − 1) // den` with q as the
    * rational its decimal spelling means, matching Stats.exactRank's
    * integer arithmetic where CEIL(q·n) through IEEE doubles is off by
    * one for some (q, n) — lower-bound representative) over a
    * caller-defined CTE `srcCte(k, v)` with v a positive BIGINT.
    * Returns the CTE suffix + final SELECT; the caller prepends
    * `WITH <srcCte> AS (...),`. ONE copy — q214/q215/q216 all grade
    * against this fragment, so the sketch constants can never drift
    * between their oracles.
    */
  def relQuantileWalk(srcCte: String, keyOut: String): String =
    s"""_rqw_bk AS (
           SELECT k, ${relBucketExpr("v")} AS b FROM $srcCte),
         _rqw_c AS (SELECT k, b, COUNT(*) AS c FROM _rqw_bk GROUP BY k, b),
         _rqw_cum AS (
           SELECT k, b, SUM(c) OVER (PARTITION BY k ORDER BY b) AS cum,
                  SUM(c) OVER (PARTITION BY k) AS n
           FROM _rqw_c),
         _rqw_r AS (
           SELECT k, cum, n, CASE WHEN b < 128 THEN b
             ELSE (128 + b % 128) << CAST(b // 128 - 1 AS INT) END AS rep
           FROM _rqw_cum)
         SELECT k AS $keyOut, CAST(MAX(n) AS BIGINT) AS n,
           MIN(CASE WHEN cum >= (n * 5 + 9) // 10 THEN rep END) AS p50,
           MIN(CASE WHEN cum >= (n * 9 + 9) // 10 THEN rep END) AS p90,
           MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN rep END) AS p99
         FROM _rqw_r GROUP BY k"""

  /** DuckDB mirror of `Stats.relBucket`/`relBucketOf` at subBits = 7
    * on an arbitrary SQL expression (e.g. a literal rank probe):
    * (e-6)·128 + (v >> (e-7)) - 128 with e = length(bin(v)) - 1.
    */
  def relBucketExpr(v: String): String =
    s"(CASE WHEN ($v) < 128 THEN ($v) ELSE " +
      s"(CAST(length(bin($v)) - 1 AS BIGINT) - 6) * 128 + " +
      s"(($v) >> CAST(length(bin($v)) - 8 AS INT)) - 128 END)"

  /** The layout-invisible 2-D box oracle shared by every orders-layout
    * query (q153 z-order, q209 Hilbert dirs, q220 OPTIMIZE): the same
    * quartile box over (o_custkey, o_orderkey) regardless of HOW the
    * store laid the data out — layout must only change which dirs the
    * read skips, never the content.
    */
  val ordersBoxOracle: String =
    """WITH b AS (SELECT MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
                  MIN(o_orderkey) AS kmin, MAX(o_orderkey) AS kmax
                  FROM orders),
        r AS (SELECT cmin + (cmax - cmin) // 4 AS clo,
              cmin + (cmax - cmin) * 2 // 5 AS chi,
              kmin + (kmax - kmin) // 4 AS klo,
              kmin + (kmax - kmin) * 2 // 5 AS khi FROM b)
        SELECT o_custkey AS cust, o_orderkey AS k, o_totalprice AS p
        FROM orders, r
        WHERE o_custkey BETWEEN clo AND chi
          AND o_orderkey BETWEEN klo AND khi"""
}
