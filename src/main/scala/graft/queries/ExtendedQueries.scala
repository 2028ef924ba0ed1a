package graft.queries

import graft.Tables
import graft.functions.NumFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Surface beyond the reference (SURVEY §2.7 notes the reference has no
  * windows/sorts/set-ops at all): distinct, set operations, semi/anti
  * joins, statistical aggregates, session windows — the operators a user
  * of a general engine expects, each oracle-backed.
  */
object ExtendedQueries {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DISTINCT (dedup on full projection — one shuffle).
    "q27_distinct" -> ((s, dir) => {
      t(s, dir, "events").select(col("user_id"), col("event_type")).distinct()
    }),

    // INTERSECT / EXCEPT / UNION composition over keyed subsets.
    "q28_set_ops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purch = ev.where(col("event_type") === "purchase").select(col("user_id")).distinct()
      val errs = ev.where(col("event_type") === "error").select(col("user_id")).distinct()
      purch.intersect(errs).withColumn("op", lit("both"))
        .unionByName(purch.except(errs).withColumn("op", lit("purchase_only")))
        .unionByName(errs.except(purch).withColumn("op", lit("error_only")))
    }),

    // LEFT SEMI / LEFT ANTI (EXISTS / NOT EXISTS).
    "q29_semi_anti" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ords = t(s, dir, "orders")
      val has = cust.join(ords, cust("c_custkey") === ords("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("status"))
      val none = cust.join(ords, cust("c_custkey") === ords("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("status"))
      has.unionByName(none)
    }),

    // Statistical aggregates: exact distinct count, sample stddev,
    // exact interpolated median. The median comes from Stats.exactMedian
    // — the partial-agg two-pass count/offset form — NOT the built-in
    // percentile(), which buffers every value of a group inside one
    // aggregation task (with 3 keys, a per-task memory bomb at 100 TB).
    // The three-row median frame joins back onto the count/stddev agg by
    // broadcast. StatsSpec pins the built-in percentile() equal to
    // exactMedian as the fidelity variant; q41 is the sketch path when
    // approximation is acceptable.
    "q30_stats_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val base = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          NumFns.stableRound(stddev_samp(col("l_extendedprice")), 4).as("sd_price"))
      val med = graft.operators.Stats.exactMedian(li, "l_returnflag", "l_quantity",
        outCol = "med_qty")
      base.join(broadcast(med), Seq("l_returnflag"))
    }),

    // Exact median without group buffering: two-pass count/offset form
    // (Stats.exactMedian) — the scale path for exact quantiles on
    // low-cardinality keys.
    "q51_exact_median" -> ((s, dir) => {
      graft.operators.Stats.exactMedian(
          t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")
        .select(col("l_returnflag"),
          NumFns.stableRound(col("median"), 4).as("med_price"))
    }),

    // Session windows (gap-based), the streaming session operator run in
    // batch mode: one shuffle on (user, session).
    "q31_sessionize" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          NumFns.stableRound(sum(col("value")), 4).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("session_start"),
          col("n_events"), col("sum_value"))
    }),

    // TF-IDF top-3 terms per doc: explode (the generator op) -> two
    // hash aggregates -> broadcast N -> ranked window.
    "q32_tfidf" -> ((s, dir) => {
      graft.operators.TfIdf.topK(t(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("doc_id"), col("token"), col("tf"),
          NumFns.stableRound(col("tfidf"), 6).as("tfidf"), col("rnk"))
    }),

    // Multimodal feature extraction through the partition-iterator path
    // (mapPartitions batch shape). The stub decoder's byte-histogram is
    // deterministic byte arithmetic, so the oracle replays it in SQL
    // and the whole mapPartitions path is value-verified.
    "q33_multimodal_features" -> ((s, dir) => {
      graft.operators.Multimodal.extractFeatures(
          graft.operators.Multimodal.mediaFromDocuments(t(s, dir, "documents")))
        .select(col("media_id"), col("byte_len"), col("mime"),
          element_at(col("feature"), 4).as("alpha_frac"))
    }),

    // Real image decode through the multimodal seam: deterministic
    // binary P6 PPM payloads (LCG pixel plane — regenerable without
    // binary parsing) rendered per document, then ACTUALLY parsed by
    // Multimodal.decodePpm (header ints + raw RGB plane) inside the
    // partition-iterator batch path. The oracle regenerates every pixel
    // arithmetically and must agree with the decoder on dimensions and
    // per-channel means — so the graded check verifies decoded FIELD
    // VALUES, not just byte statistics (q33 covers the histogram form).
    "q65_ppm_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => (id, graft.operators.Multimodal.syntheticPpm(id)))
        .toDF("media_id", "payload")
      graft.operators.Multimodal.ppmFeatures(media)
    }),

    // Full near-dedup pipeline: LSH candidates -> exact verify ->
    // min-id survivors. Oracle: the all-pairs exact-verify truth —
    // the pipeline's survivors must equal the min-id survivors of
    // every pair above the verify threshold (LSH candidate recall is
    // complete at that similarity; q23 pins the same property at the
    // pair level).
    "q34_near_dedup" -> ((s, dir) => {
      graft.operators.Dedup.nearDedup(t(s, dir, "documents"), "doc_id", "text",
          estThreshold = 0.3, jaccardThreshold = 0.4)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // Corpus curation pipeline: clean gate -> quality filter -> language
    // ID -> exact dedup (keep min id) -> fingerprint of the kept docs.
    // The composed training-data shape, fully oracle-backed.
    "q35_corpus_pipeline" -> ((s, dir) => {
      import graft.functions.TextFns
      val docs = t(s, dir, "documents")
        .withColumn("clean", TextFns.cleanText(col("text")))
        .na.drop(Seq("clean"))
        .withColumn("_toks", TextFns.tokens(col("clean")))
        .withColumn("n_toks", size(col("_toks")).cast("long"))
        .withColumn("uniq_ratio",
          size(array_distinct(col("_toks"))).cast("double") / size(col("_toks")))
        .where(col("n_toks") >= 20 && col("uniq_ratio") >= 0.15)
        .withColumn("lang_pred", TextFns.langIdFromTokens(col("_toks")))
        .withColumn("fp", TextFns.fingerprint(col("clean")))
      // min-id-per-fingerprint via a window over the ALREADY-COMPUTED
      // narrow projection: the semi-join form recomputed the whole
      // clean/tokenize/langid pipeline on the aggregate side (self-join
      // lineage duplication); this runs the text work once and shuffles
      // only (doc_id, lang_pred, n_toks, fp)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      docs.select(col("doc_id"), col("lang_pred"), col("n_toks"), col("fp"))
        .withColumn("_min_id", min(col("doc_id")).over(w))
        .where(col("doc_id") === col("_min_id"))
        .drop("_min_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q27_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q28_set_ops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
              e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
         SELECT user_id, 'both' AS op FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
         UNION ALL
         SELECT user_id, 'purchase_only' AS op FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
         UNION ALL
         SELECT user_id, 'error_only' AS op FROM (SELECT user_id FROM e EXCEPT SELECT user_id FROM p)""",
    "q29_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS status FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT c_custkey, 'no_orders' AS status FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q30_stats_agg" ->
      s"""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
          ${SqlFragments.r15("stddev_samp(l_extendedprice)", 4)} AS sd_price,
          quantile_cont(l_quantity, 0.5) AS med_qty
          FROM lineitem GROUP BY l_returnflag""",
    "q51_exact_median" ->
      s"""SELECT l_returnflag,
          ${SqlFragments.r15("quantile_cont(l_extendedprice, 0.5)", 4)} AS med_price
          FROM lineitem GROUP BY l_returnflag""",
    "q31_sessionize" ->
      s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
          m AS (SELECT user_id, ts, value,
                CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 1 HOUR
                     THEN 1 ELSE 0 END AS brk
                FROM e),
          s AS (SELECT user_id, ts, value,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
                FROM m)
          SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
            ${SqlFragments.r15("SUM(value)", 4)} AS sum_value
          FROM s GROUP BY user_id, sid""",
    "q33_multimodal_features" ->
      // mirrors Multimodal.decodeStub over utf-8 payload bytes: the
      // corpus is ASCII, so codepoints == bytes and length == octet
      // count; bin 3 of the 8-bin (byte >> 5) histogram = codes 96-127
      """SELECT doc_id AS media_id,
         CAST(COALESCE(octet_length(encode(text)), 0) AS BIGINT) AS byte_len,
         'text/plain' AS mime,
         CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
              ELSE CAST(len(list_filter(range(1, length(text) + 1),
                     i -> (unicode(substring(text, i, 1)) // 32) = 3)) AS DOUBLE)
                   / length(text) END AS alpha_frac
         FROM documents""",
    "q65_ppm_decode" ->
      // regenerate the 8x6 P6 pixel plane (byte i of media id =
      // (1103515245*(id+i)+12345) mod 256) and fold the same per-channel
      // means the decoder computes; integer sums are exact in double and
      // the single division is identical IEEE in both engines -> raw
      """WITH px AS (
           SELECT doc_id, (1103515245 * (doc_id + i) + 12345) % 256 AS b, i % 3 AS ch
           FROM documents, generate_series(0, 143) t(i))
         SELECT doc_id AS media_id,
           CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
           CAST(48 AS BIGINT) AS n_px,
           CAST(SUM(b) FILTER (WHERE ch = 0) AS DOUBLE) / 48.0 AS mean_r,
           CAST(SUM(b) FILTER (WHERE ch = 1) AS DOUBLE) / 48.0 AS mean_g,
           CAST(SUM(b) FILTER (WHERE ch = 2) AS DOUBLE) / 48.0 AS mean_b
         FROM px GROUP BY doc_id""",

    "q34_near_dedup" ->
      s"""${SqlFragments.shinglePairsCte(0.4)}
          SELECT doc_id, lang, n_chars FROM documents
          WHERE doc_id NOT IN (SELECT DISTINCT b_id FROM verified)""",
    "q32_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${SqlFragments.toksExpr}) AS token FROM documents),
          tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
          dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
          n AS (SELECT COUNT(*) AS n FROM documents),
          sc AS (SELECT doc_id, token, tf,
                 CAST(tf AS DOUBLE) * (ln((n.n + 1.0) / (df + 1.0)) + 1.0) AS tfidf
                 FROM tf JOIN dfreq USING (token) CROSS JOIN n),
          r AS (SELECT doc_id, token, tf, tfidf,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
                FROM sc)
          SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
            ${SqlFragments.r15("tfidf", 6)} AS tfidf, CAST(rnk AS BIGINT) AS rnk
          FROM r WHERE rnk <= 3""",
    "q35_corpus_pipeline" -> {
      val m = SqlFragments.langMarkers
      val codes = m.keys.toSeq.sorted
      val hits = codes.map(c => s"${SqlFragments.markerHitsExpr(m(c))} AS hits_$c").mkString(", ")
      val best = codes.map(c => s"WHEN hits_$c = mx THEN '$c'").mkString(" ")
      s"""WITH cleaned AS (
            SELECT doc_id, ${SqlFragments.cleanExpr} AS clean FROM documents
            WHERE text IS NOT NULL AND LENGTH(text) >= 10),
          toksd AS (
            SELECT doc_id, clean,
              list_filter(regexp_split_to_array(lower(clean), '\\s+'), x -> length(x) > 0) AS toks
            FROM cleaned),
          q AS (
            SELECT doc_id, clean, toks, len(toks) AS n_toks,
              CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
            FROM toksd
            WHERE len(toks) >= 20
              AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.15),
          l AS (
            SELECT doc_id, clean, n_toks, $hits FROM q),
          g AS (
            SELECT *, ${codes.map(c => s"hits_$c").mkString("GREATEST(", ", ", ")")} AS mx FROM l),
          langed AS (
            SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
              CASE WHEN mx = 0 THEN 'und' $best END AS lang_pred,
              md5(TRIM(REGEXP_REPLACE(lower(clean), '\\s+', ' ', 'g'))) AS fp
            FROM g),
          keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM langed GROUP BY fp)
          SELECT langed.doc_id, lang_pred, n_toks, langed.fp
          FROM langed JOIN keep ON langed.fp = keep.fp AND langed.doc_id = keep.doc_id"""
    }
  )
}
