package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

/** Plan-shape assertions: the scale properties the engine is designed
  * around must be visible in the physical plan, not assumed — filter
  * pushdown to parquet, column pruning, broadcast of small join sides,
  * whole-stage codegen on hot paths.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters and projection push to the parquet scan") {
    val df = Tables.load(spark, sf(), "lineitem")
      .where(col("l_returnflag") === "R" && col("l_quantity") > 10)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_quantity)"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    // column pruning: only the needed columns in ReadSchema
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double"), p)
    assert(!p.contains("l_extendedprice"), "scan reads pruned column: " + p)
  }

  test("daily join broadcasts the aggregated (small) side") {
    val df = SparkEntry.queries("q02_join_daily")(spark, sf())
    df.collect() // let AQE finalize
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("batch pipeline join is an explicit broadcast") {
    import spark.implicits._
    val news = Seq(("2026-01-01", "a sufficiently long text about gains")).toDF("Date", "Text")
    val stock = Seq(("2026-01-01", 1.0, 1.0, 1.0, 1.0, 1.0))
      .toDF("Date", "Open", "High", "Low", "Close", "Volume")
    val out = graft.batch.BatchPipeline.run(news, stock, "2026-02-01")
    assert(plan(out).contains("BroadcastHashJoin"), plan(out))
  }

  private def hasCodegen(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.collect { case w: WholeStageCodegenExec => w }.nonEmpty

  test("text operators stay inside whole-stage codegen (no UDF barriers)") {
    val df = SparkEntry.queries("q11_clean_text")(spark, sf())
    assert(hasCodegen(df), plan(df))
    val p = plan(df)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("native CosineSim participates in codegen") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val df = emb.select(graft.expressions.CosineSim(col("embedding"), col("embedding")).as("s"))
    assert(hasCodegen(df), plan(df))
  }

  test("brute-force top-k is a bounded aggregate, not a rank window") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val df = graft.operators.Similarity.bruteForceTopK(
      emb.where(col("vec_id") < 5), emb, 3)
    val p = plan(df)
    // window functions have no partial aggregation; the bounded top-k
    // Aggregator must appear as an ObjectHashAggregate instead
    assert(!p.contains("Window "), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("IVF corpus-to-cell assignment is a pure projection: one shuffle total, no window") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val df = graft.operators.Similarity.ivfTopK(
      emb.where(col("vec_id") < 5), emb, 3, nCells = 4, nProbe = 2)
    val p = plan(df)
    assert(!p.contains("Window "), p)
    // the only exchange is the final top-k partial-merge on qid; cell
    // assignment itself is argmin over inlined centroid literals and the
    // probe join broadcasts the tiny (query, cell) side
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 1, s"$shuffles shuffles in:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("rank-limit queries get the built-in WindowGroupLimit pushdown") {
    // Custom-operator ladder stance (SURVEY §7.3): no custom
    // Rule[LogicalPlan]/SparkPlan for window top-k because Catalyst's
    // InferWindowGroupLimit already bounds rank-filter windows map-side
    // (Partial below the exchange + Final above) — pinned here so the
    // decision stays verified. TopKBySim exists for the ANN paths where
    // an aggregate (one merged row per query) beats emitting ranked
    // rows through two sorted passes.
    val df = SparkEntry.queries("q07_topn_per_key")(spark, sf())
    assert(plan(df).contains("WindowGroupLimit"), plan(df))
  }

  test("near-dedup never goes cartesian (candidates are key-joined)") {
    val df = SparkEntry.queries("q34_near_dedup")(spark, sf())
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q132 (default, dense corpus): bitset kernel plan — broadcast verify, no single-partition exchange") {
    val df = SparkEntry.queries("q132_jaccard_prefix_join")(spark, sf())
    val p = plan(df)
    // the r6 scale-killer: global row_number() ranked the vocabulary
    // through one partition — now sort+zipWithIndex, so no plan node
    // may collapse to a single partition
    assert(!p.contains("Exchange SinglePartition"), p)
    // the testdata vocabulary is tiny (31 distinct tokens), so the
    // adaptive switch must take the dense path: AND+popcount verify
    // over broadcast bitmaps, with NO prefix/index explode joins
    assert(p.contains("bitset_and_count"), p)
    assert(!p.contains("sorted_intersect_count"), p)
  }

  test("q132 sparse path (forced): PPJoin length+positional filters live in the candidate join") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val df = graft.operators.Dedup.jaccardPrefixJoin(
      docs, "doc_id", "text", 0.95, denseVocabLimit = 0)
    val p = plan(df)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate join must carry the length filter (t*max<=min, the
    // 0.95 factors) and the positional filter (least(remaining
    // suffix)) INSIDE its predicate — not as a post-join filter
    val joinLines = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("0.95")).toSeq
    assert(joinLines.exists(l => l.contains("least(")),
      "candidate join lacks length/positional filters:\n" + p)
    // verify is the zero-allocation sorted-merge kernel, not
    // array_intersect's per-call hash set
    assert(p.contains("sorted_intersect_count"), p)
  }

  test("set joins: dense and sparse kernels agree pair-for-pair") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(graft.operators.Dedup.jaccardPrefixJoin(docs, "doc_id", "text", 0.9)) ==
      rows(graft.operators.Dedup.jaccardPrefixJoin(docs, "doc_id", "text", 0.9,
        denseVocabLimit = 0)))
    assert(rows(graft.operators.Dedup.containmentJoin(docs, "doc_id", "text", 0.8)) ==
      rows(graft.operators.Dedup.containmentJoin(docs, "doc_id", "text", 0.8,
        denseVocabLimit = 0)))
  }

  test("two-pass exact median has no group-buffering percentile aggregate") {
    val df = SparkEntry.queries("q51_exact_median")(spark, sf())
    val p = plan(df)
    assert(!p.toLowerCase.contains("percentile"), p)
  }

  test("graded q30 plan carries no percentile buffer either") {
    val df = SparkEntry.queries("q30_stats_agg")(spark, sf())
    val p = plan(df)
    assert(!p.toLowerCase.contains("percentile"), p)
  }

  test("graded bucketed join (q60) joins and aggregates with zero Exchange") {
    // the write-time bucket shuffle is the only shuffle this key ever
    // pays; join + groupBy on the bucket key reuse the layout directly
    val df = SparkEntry.queries("q60_bucketed_join")(spark, sf())
    val p = plan(df)
    assert(!p.contains("Exchange"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("q24 runs the LSH candidate stage and the simhash corpus pass exactly once") {
    // the pair melt + single signature join keeps both expensive corpus
    // passes single-instanced — the old two-key sig joins duplicated
    // the simhash subplan (no common-subplan reuse across different
    // join keys). The LSH candidate stage is now localCheckpoint'ed
    // inside lshVerifiedPairs (exactly-once by materialization), so
    // minhash_sigs appears at most once in the remaining plan: zero
    // when the checkpoint absorbed it, never the duplicated two.
    val df = SparkEntry.queries("q24_simhash")(spark, sf())
    val p = plan(df)
    assert("minhash_sigs".r.findAllIn(p).size <= 1, p)
    assert("simhash64".r.findAllIn(p).size == 1, p)
  }

  test("AQE splits a skewed sort-merge join at runtime (OptimizeSkewedJoin)") {
    // Documents WHEN manual salting is needed (Skew.saltedJoin scaladoc
    // cross-reference): for a plain shuffled equi-join, AQE already
    // detects the hot key's oversized shuffle partition at runtime and
    // splits it (SortMergeJoin(skew=true)) — no salting required. The
    // manual forms remain for what AQE can't re-plan: skewed
    // AGGREGATIONS (saltedSumCount) and joins whose partitioning must
    // stay stable (bucketed layouts, co-partitioned stages).
    import spark.implicits._
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key (~150k rows) against a uniform tail — the hot key's
      // shuffle partition dwarfs the median and crosses the threshold
      val fact = spark.range(0, 200000)
        .select(when(col("id") < 150000, lit(0L)).otherwise(pmod(col("id"), lit(97L)) + 1).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 98).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, Seq("k"))
      // execute THIS query execution: .count() would plan and run a
      // different (aggregated) one, leaving joined's plan un-finalized
      assert(joined.collect().length == 200000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no skew split in:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("graded q09 runs through the bounded typed aggregator, not collect_list") {
    val df = SparkEntry.queries("q09_ew_average")(spark, sf())
    val p = plan(df)
    assert(!p.contains("collect_list"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("PII scrub (q66) is a shuffle-free codegen'd map stage") {
    val df = SparkEntry.queries("q66_pii_redact")(spark, sf())
    val p = plan(df)
    assert(!p.contains("Exchange"), p)
    assert(hasCodegen(df), p)
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
  }

  test("temperature mix (q69) broadcasts rates; the corpus side never shuffles") {
    val df = SparkEntry.queries("q69_temperature_mix")(spark, sf())
    df.collect() // let AQE finalize
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // corpus-side segment of the printed tree: from the explode down to
    // the doc_id scan (the streamed join side prints before the
    // broadcast side) — must contain no shuffle of any kind
    val lines = p.linesIterator.toVector
    val from = lines.indexWhere(_.contains("Generate explode"))
    val to = lines.indexWhere(l => l.contains("FileScan parquet") && l.contains("doc_id"), from)
    assert(from >= 0 && to > from, p)
    val segment = lines.slice(from, to + 1)
    assert(!segment.exists(_.contains("Exchange")),
      s"corpus side shuffles:\n${segment.mkString("\n")}")
  }

  test("SQ8 encode (q72) never shuffles the corpus projection") {
    val df = SparkEntry.queries("q72_scalar_quantize")(spark, sf())
    val p = plan(df)
    assert(!p.contains("Exchange"), p)
    assert(hasCodegen(df), p)
  }

  test("contamination (q68) stages tokens below the Generate (no per-output-row re-eval)") {
    val df = SparkEntry.queries("q68_contamination")(spark, sf())
    val p = plan(df)
    // the Generate's generator must consume a staged array attribute,
    // not the inlined tokenize chain over `text` — with the chain
    // inline, InferFiltersFromGenerate clones the (CodegenFallback,
    // interpreted) lambda chain into inferred + pushed-down filters,
    // multiplying its per-row cost ~6x (measured 19x total at sf0.1)
    val gen = p.linesIterator.filter(_.contains("Generate explode")).toSeq
    assert(gen.nonEmpty, p)
    assert(!gen.exists(_.contains("split(lower")), s"tokenize inlined into Generate:\n$gen")
  }

  test("repeated spans (q91) stages grams below its Generates; exactly 2 corpus shuffles + window") {
    val df = SparkEntry.queries("q91_repeated_spans")(spark, sf())
    val p = plan(df)
    // same trap as q68: the per-position k-gram transform must be a
    // staged attribute, not re-derived from `text` inside the generator
    val gen = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(gen.nonEmpty, p)
    assert(!gen.exists(_.contains("split(lower")), s"tokenize inlined into Generate:\n$gen")
    // anchor-bucket shuffle + islands-window shuffle, nothing else
    assert(p.split("Exchange").length - 1 == 2, p)
  }

  test("funnel (q103): all stage windows share ONE user shuffle + one melt agg exchange") {
    val df = SparkEntry.queries("q103_funnel")(spark, sf())
    val p = plan(df)
    // 3 Window ops, but exactly 2 Exchanges total: the user-keyed
    // shuffle every stage window (and the per-user agg) reuses, plus
    // the tiny stage-keyed melt aggregate
    assert(p.split("\\bWindow\\b").length - 1 >= 3, p)
    assert(p.split("Exchange").length - 1 == 2, p)
  }

  test("CDC apply (q101): latest-change rank runs through WindowGroupLimit") {
    val df = SparkEntry.queries("q101_cdc_apply")(spark, sf())
    val p = plan(df)
    // rn=1 filter must push the group limit below the shuffle — no key
    // ever buffers more than one row per partition
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("NOT IN (q126) plans as a null-aware anti join, not a cartesian filter") {
    val df = SparkEntry.queries("q126_null_aware_anti")(spark, sf())
    val p = plan(df)
    // Spark's single-column null-aware anti: BroadcastHashJoin LeftAnti
    // whose trailing boolean is isNullAwareAntiJoin=true; a plain
    // LeftAnti (flag false) would be wrong semantics, a
    // BroadcastNestedLoopJoin the quadratic fallback
    assert(p.contains("LeftAnti, BuildRight, true"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("interval overlap (q124) joins on (key, bin) equi-keys — no NLJ anywhere") {
    val df = SparkEntry.queries("q124_interval_overlap")(spark, sf())
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("PQ encode (q90) is one shuffle-free projection over the scan") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val books = graft.operators.Quantize.pqCodebooks(
      emb, "vec_id", "embedding", m = 4, k = 4, iterations = 1)
    val df = graft.operators.Quantize.pqEncode(emb, "vec_id", "embedding", books)
    val p = plan(df)
    assert(!p.contains("Exchange"), p)
  }

  private def assertBroadcastAdcShape(p: String): Unit = {
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the only Exchange allowed is the O(k)-rows-per-query top-k agg,
    // which sits ABOVE the join in the printed tree; nothing at or
    // below the join (the corpus side) may shuffle
    val lines = p.linesIterator.toSeq
    val joinLine = lines.indexWhere(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("BroadcastHashJoin"))
    // BroadcastExchange below the join IS the query broadcast — only a
    // shuffle (hash/range partitioning) exchange would be a defect
    assert(!lines.drop(joinLine).exists(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange")),
      s"corpus shuffled below the broadcast join:\n$p")
  }

  test("ADC search (q94) broadcasts queries; coded corpus never shuffles before top-k") {
    assertBroadcastAdcShape(plan(SparkEntry.queries("q94_ann_pq_adc")(spark, sf())))
  }

  test("q193: stored-labeling touches ride the id-bucket layout — no stored-side shuffle") {
    // the at-scale contract of incrementalComponents' stored-side reads
    // (endpoint label lookups, new-node anti-join, final remap): with
    // broadcast off (a corpus-sized labeling could never broadcast) and
    // AQE off (a deterministic tree to traverse), every join against
    // the bucketed labeling must consume the bucket layout directly —
    // zero ShuffleExchange anywhere above a bucketed scan. Only the
    // tiny new-edge/label-graph side pays exchanges.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q193_bucketed_incremental_clusters")(spark, sf())
      val p = df.queryExecution.executedPlan
      def bucketed(sp: org.apache.spark.sql.execution.SparkPlan) =
        sp.collect { case s: FileSourceScanExec if s.relation.bucketSpec.nonEmpty => s }
      val scans = bucketed(p)
      assert(scans.nonEmpty, s"no bucketed labeling scan in:\n$p")
      // the scan actually reads the layout as buckets (not as plain files)
      assert(p.toString.contains("SelectedBucketsCount"), p.toString)
      val shuffledStored = p.collect {
        case e: ShuffleExchangeExec if bucketed(e.child).nonEmpty => e
      }
      assert(shuffledStored.isEmpty,
        s"stored labeling shuffled despite bucket layout:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("stored-index ADC search (q148) keeps the broadcast shape: the persisted codes scan never shuffles") {
    val root = graft.sources.Scratch.processScoped("planshape_q148", sf())
    graft.sources.Scratch.deleteRecursively(new java.io.File(root))
    val store = new graft.sources.SnapshotStore(spark, root)
    val emb = Tables.load(spark, sf(), "embeddings")
    graft.operators.VectorIndex.buildPq(store, "ann", emb, emb,
      "vec_id", "embedding", m = 4, k = 4)
    val df = graft.operators.VectorIndex.searchPq(store, "ann",
      emb.where(col("vec_id") < 3), k = 5)
    assertBroadcastAdcShape(plan(df))
  }
}
