package graft.queries

import graft.Tables
import graft.functions.NumFns
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational/SQL surface: global sort + top-k, grouping sets,
  * pivot, scalar string/date functions, approximate sketches, and the
  * ANN scale path — rounding out what a user of a general engine runs
  * daily.
  */
object RelationalQueries {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Bucketed layouts this process has materialized (q60): cleanup must
    * never delete a dir whose catalog entry is still live in this JVM.
    */
  private val q60Tables = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Point-in-time (as-of) dimension join — feature-store correctness
    // for training data: each fact row joins the dimension version
    // valid AT ITS OWN event time (joining today's feature values onto
    // 1996 facts is label leakage). The versioned dimension is a
    // 3-version changelog (customer features stepped at 1995/1997/
    // 1999); the lookup is AsOfJoin's ONE-shuffle union+window — never
    // a per-fact correlated probe (the oracle replays with one, the
    // engine must not).
    "q143_point_in_time" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey").as("k"),
        to_date(col("o_orderdate")).as("d"), col("o_totalprice").as("p"))
      val cust = t(s, dir, "customer")
      val ch = (0 to 2).map { v =>
        cust.select(col("c_custkey").as("k"),
          to_date(lit(s"${1995 + 2 * v}-01-01")).as("vf"),
          (col("c_acctbal") + lit(100.0 * v)).as("f"))
      }.reduce(_ unionByName _)
      graft.operators.AsOfJoin.lookupLast(o, ch, key = "k",
          leftTime = "d", rightTime = "vf", rightValue = "f", outCol = "f")
        .groupBy(year(col("d")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"),
          NumFns.stableRound(sum(col("p")), 2).as("total_p"),
          NumFns.stableRound(sum(col("f")), 2).as("total_f"))
    }),

    // Robust per-group outlier gate: MAD-based modified z-score
    // (Iglewicz–Hoaglin) over account balances with injected
    // 50× corruption — the heavy-tail-safe version of q109's
    // mean/stddev z (one spam cluster drags a mean; it barely moves a
    // median). Both medians are the two-pass exact percentile, r15'd
    // before the gate so the boundary is bit-identical cross-engine.
    "q147_mad_outliers" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_nationkey"),
        when(col("c_custkey") % 97 === 0, col("c_acctbal") * 50)
          .otherwise(col("c_acctbal")).as("bal"))
      graft.operators.Stats.madOutliers(cust, "c_nationkey", "bal", cut = 3.5)
        .select(col("c_nationkey").cast("long").as("nation"), col("n"),
          col("n_outliers"), col("med"), col("mad"))
    }),

    // CDC apply: a changelog with upserts AND deletes (tombstones) folds
    // onto a base snapshot — last change per key wins, 'D' removes the
    // key, untouched base keys pass through. The delete half is what
    // ViewStore.merge (q79's dynamic partition overwrite) cannot
    // express. Changes derive from lineitem (linenumber = change seq,
    // every 5th a delete) so the oracle replays rank, tombstone and
    // passthrough exactly.
    "q101_cdc_apply" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .where(date_format(col("o_orderdate"), "yyyy-MM-dd")
          .between("1995-01-01", "1995-01-31"))
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      val changes = t(s, dir, "lineitem")
        .where(to_date(col("l_shipdate")).between("1995-01-01", "1995-03-31"))
        .select(col("l_orderkey").as("k"), col("l_extendedprice").as("p"),
          when(col("l_linenumber") % 5 === 0, "D").otherwise("U").as("op"),
          col("l_linenumber").cast("long").as("seq"))
      graft.operators.Changelog.applyChangelog(base, changes, "k", "seq", "op",
        tieBreak = Seq("p"))
    }),

    // SCD2 history: each change becomes a validity interval
    // [valid_from, valid_to) per key via one LEAD window; the open
    // interval is the current row — the standard dimension-history
    // build, replayed by the oracle verbatim.
    "q102_scd2" -> ((s, dir) => {
      val changes = t(s, dir, "lineitem")
        .where(col("l_orderkey") % 13 === 0)
        .select(col("l_orderkey").as("k"), col("l_extendedprice").as("p"),
          col("l_linenumber").cast("long").as("seq"))
      graft.operators.Changelog.scd2(changes, "k", "seq", tieBreak = Seq("p"))
        .select(col("k"), col("p"), col("valid_from"), col("valid_to"),
          col("is_current"))
    }),

    // Ordered funnel (view -> click -> purchase, strictly increasing
    // timestamps) over a sparse event sample so stages actually drop
    // off. One user-keyed shuffle; stage windows and the per-user
    // reduction reuse its partitioning.
    "q103_funnel" -> ((s, dir) =>
      graft.operators.Funnel.funnel(
        t(s, dir, "events").where(col("event_id") % 11 === 0),
        "user_id", "event_type", "ts",
        stages = Seq("view", "click", "purchase"))),

    // PageRank, 3 iterations — the iterative-shuffle workload class.
    // Deterministic synthetic edge set from events (user -> floor(value)
    // mod 500); every iteration's ranks pass through stableRound, so
    // the oracle replays the unrolled trajectory hash-exactly (the
    // KMeans stableScale device applied to graph state).
    // DeepWalk-style walk corpus over the q104 graph: one
    // LCG-deterministic walk per start node, 4 steps, each step ONE
    // frontier join against the rank-ordered adjacency — the
    // graph-to-sentences preprocessing an embedding trainer (q157
    // skip-grams) consumes, replayable in SQL because the "random"
    // neighbor pick is the shared 31-bit LCG convention.
    "q254_random_walks" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select(pmod(col("user_id"), lit(500)).as("src"),
          pmod(floor(col("value")), lit(500)).cast("long").as("dst"))
      graft.operators.Walks.randomWalks(edges, "src", "dst", steps = 4)
    }),

    // node2vec-biased walks (p=2, q=4 as dyadic weights .5/1/.25):
    // second-order walk — the neighbor pick at step t weights return
    // (nbr = prev), distance-1 (edge prev->nbr) and far neighbors
    // differently, via inverse-CDF at an LCG threshold over the
    // nbr-ordered cumulative weights. All sums dyadic-exact, so the
    // unrolled SQL replays the pick bit-for-bit.
    "q260_node2vec_walks" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select(pmod(col("user_id"), lit(500)).as("src"),
          pmod(floor(col("value")), lit(500)).cast("long").as("dst"))
      graft.operators.Walks.node2vecWalks(edges, "src", "dst", steps = 3)
    }),

    "q104_pagerank" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select(pmod(col("user_id"), lit(500)).as("src"),
          pmod(floor(col("value")), lit(500)).as("dst"))
      graft.operators.PageRank.run(edges, "src", "dst", iterations = 3)
    }),

    // Per-group winsorized statistics: exact [P05, P95] thresholds per
    // return flag (the q51/q120 two-pass count-offset shape — both
    // quantiles in ONE pass, no group buffering), clamp, and compare
    // raw vs winsorized means. The robust-mean / outlier-trim step of
    // any metrics pipeline.
    "q127_winsorize" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("k"), col("l_extendedprice").as("v"))
      val thr = graft.operators.Stats.exactPercentiles(li, "k", "v",
          ps = Seq(0.05, 0.95))
        .groupBy(col("k"))
        .agg(NumFns.stableRound(min(when(col("p") === 0.05, col("pct"))), 6).as("lo"),
          NumFns.stableRound(max(when(col("p") === 0.95, col("pct"))), 6).as("hi"))
      li.join(broadcast(thr), Seq("k"))
        .withColumn("w", least(greatest(col("v"), col("lo")), col("hi")))
        .groupBy(col("k"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n"),
          NumFns.stableRound(avg(col("v")), 4).as("mean_raw"),
          NumFns.stableRound(avg(col("w")), 4).as("mean_winsor"))
    }),

    // 2-D skyline / Pareto frontier (maximize price and size): the
    // quadratic NOT-EXISTS dominance check collapsed to per-x maxima +
    // one running-max sweep; the oracle IS the NOT-EXISTS definition,
    // so the sweep is proven equivalent on real data.
    "q129_skyline" -> ((s, dir) =>
      graft.operators.Skyline.frontier2D(
        t(s, dir, "part"), "p_retailprice", "p_size")
        .select(col("x"), col("y").cast("long").as("y"), col("n_pts"))),

    // Interval-interval overlap join, binned — no theta-join NLJ. Supply
    // windows (14-day order intervals vs 7-day ship intervals, keyed by
    // a 50-way hash) meet on (key, bin) equi-joins; the oracle is the
    // direct inequality join.
    "q124_interval_overlap" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .where(col("o_orderkey") % 47 === 0)
        .select(pmod(col("o_custkey"), lit(50)).as("ak"),
          col("o_orderkey").as("a_id"),
          datediff(to_date(col("o_orderdate")), lit("1990-01-01")).as("as0"))
        .withColumn("ae", col("as0") + 14)
      val b = t(s, dir, "lineitem")
        .where(col("l_orderkey") % 61 === 0)
        .select(pmod(col("l_suppkey").cast("long"), lit(50)).as("bk"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("b_id"),
          datediff(to_date(col("l_shipdate")), lit("1990-01-01")).as("bs0"))
        .withColumn("be", col("bs0") + 7)
      graft.operators.RangeJoin.overlapJoin(a, b,
        "ak", "a_id", "as0", "ae", "bk", "b_id", "bs0", "be", binWidth = 14L)
    }),

    // q124 through the NATIVE whole-operator path: a custom LogicalPlan
    // (IntervalJoinNode) planned by IntervalJoinStrategy into a
    // co-partitioned plane sweep — no 2x bin replication, no post-join
    // DISTINCT shuffle, no bin-width to tune; state per partition is
    // the max concurrent overlap. Same direct-inequality oracle as
    // q124: the physical path must be semantically invisible.
    "q207_interval_native" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .where(col("o_orderkey") % 47 === 0)
        .select(pmod(col("o_custkey"), lit(50)).as("ak"),
          col("o_orderkey").as("a_id"),
          datediff(to_date(col("o_orderdate")), lit("1990-01-01")).as("as0"))
        .withColumn("ae", col("as0") + 14)
      val b = t(s, dir, "lineitem")
        .where(col("l_orderkey") % 61 === 0)
        .select(pmod(col("l_suppkey").cast("long"), lit(50)).as("bk"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("b_id"),
          datediff(to_date(col("l_shipdate")), lit("1990-01-01")).as("bs0"))
        .withColumn("be", col("bs0") + 7)
      graft.operators.RangeJoin.overlapJoinNative(a, b,
        "ak", "a_id", "as0", "ae", "bk", "b_id", "bs0", "be")
    }),

    // q207's sweep forced through its SPILL TIER: the active right set
    // migrates into the sorter-backed buffer (what SortMergeJoin
    // buffers matches in — disk-spillable under memory pressure) by
    // dialing spark.graft.intervalJoin.inMemoryRows to 4 on a child
    // session, so every key's active set runs sorter-tier code on real
    // data. Same direct-inequality oracle as q124/q207: the storage
    // tier of the operator's state must be just as invisible as its
    // physical plan. (The pathological-degree ceiling and the
    // dead-right compaction policy are spec-pinned.)
    "q266_interval_spill" -> ((s0, dir) => {
      val s = s0.newSession()
      s.conf.set("spark.graft.intervalJoin.inMemoryRows", "4")
      s.conf.set("spark.sql.shuffle.partitions",
        s0.conf.get("spark.sql.shuffle.partitions"))
      val a = t(s, dir, "orders")
        .where(col("o_orderkey") % 47 === 0)
        .select(pmod(col("o_custkey"), lit(50)).as("ak"),
          col("o_orderkey").as("a_id"),
          datediff(to_date(col("o_orderdate")), lit("1990-01-01")).as("as0"))
        .withColumn("ae", col("as0") + 14)
      val b = t(s, dir, "lineitem")
        .where(col("l_orderkey") % 61 === 0)
        .select(pmod(col("l_suppkey").cast("long"), lit(50)).as("bk"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("b_id"),
          datediff(to_date(col("l_shipdate")), lit("1990-01-01")).as("bs0"))
        .withColumn("be", col("bs0") + 7)
      graft.operators.RangeJoin.overlapJoinNative(a, b,
        "ak", "a_id", "as0", "ae", "bk", "b_id", "bs0", "be")
    }),

    // q207 in PURE SQL — the injectParser tier's second statement
    // shape: `INTERVAL JOIN ... ON k = k AND (s, e) OVERLAPS (s, e)`
    // parses (GraftSqlParser), resolves (ResolveGraftAsOfJoin), and
    // plans to the SAME plane-sweep exec as the column API. Same
    // direct-inequality oracle as q124/q207: the SQL spelling must be
    // semantically invisible too.
    "q231_interval_sql" -> ((s, dir) => {
      t(s, dir, "orders")
        .where(col("o_orderkey") % 47 === 0)
        .select(pmod(col("o_custkey"), lit(50)).as("ak"),
          col("o_orderkey").as("a_id"),
          datediff(to_date(col("o_orderdate")), lit("1990-01-01"))
            .cast("long").as("as0"))
        .withColumn("ae", col("as0") + 14)
        .createOrReplaceTempView("g_iv_a")
      t(s, dir, "lineitem")
        .where(col("l_orderkey") % 61 === 0)
        .select(pmod(col("l_suppkey").cast("long"), lit(50)).as("bk"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("b_id"),
          datediff(to_date(col("l_shipdate")), lit("1990-01-01"))
            .cast("long").as("bs0"))
        .withColumn("be", col("bs0") + 7)
        .createOrReplaceTempView("g_iv_b")
      s.sql("""SELECT ak AS key, a_id, b_id,
                      greatest(as0, bs0) AS ov_start,
                      least(ae, be) AS ov_end,
                      least(ae, be) - greatest(as0, bs0) AS ov_len
               FROM g_iv_a INTERVAL JOIN g_iv_b
               ON ak = bk AND (as0, ae) OVERLAPS (bs0, be)""")
    }),

    // SCD-2 point-in-time dimension lookup — the warehouse-classic
    // "fact timestamp within dimension validity window" join, through
    // the SAME native interval operator: the fact side degenerates to
    // a point interval [t, t+1), the dimension's consecutive validity
    // epochs come from a lead() window (half-open [vs, ve) tiles per
    // key), and the plane sweep holds at most the handful of epochs a
    // fact's timestamp can land in — no binning, no between-join NLJ.
    // The oracle is the direct BETWEEN join.
    "q210_scd2_pit_join" -> ((s, dir) => {
      val dim = t(s, dir, "orders").where(col("o_orderkey") % 11 === 0)
        .select(pmod(col("o_custkey"), lit(100)).as("key"),
          datediff(to_date(col("o_orderdate")), lit("1990-01-01"))
            .cast("long").as("vs"))
        .distinct()
        .withColumn("ve",
          lead(col("vs"), 1).over(Window.partitionBy(col("key")).orderBy(col("vs"))))
        .where(col("ve").isNotNull)
      val facts = t(s, dir, "lineitem").where(col("l_orderkey") % 31 === 0)
        .select(pmod(col("l_suppkey").cast("long"), lit(100)).as("fkey"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("fact_id"),
          datediff(to_date(col("l_shipdate")), lit("1990-01-01"))
            .cast("long").as("t"))
        .withColumn("t1", col("t") + 1)
      graft.operators.RangeJoin.overlapJoinNative(facts, dim,
          "fkey", "fact_id", "t", "t1", "key", "vs", "vs", "ve")
        .select(col("key"), col("a_id").as("fact_id"), col("b_id").as("vs"),
          pmod(col("b_id"), lit(97)).as("rate"))
    }),

    // Multi-source BFS shortest-hop distances (frontier expansion,
    // early-stop, O(frontier)-sized shuffles per level — see
    // operators/Bfs.scala) over the symmetrized order↔part
    // co-occurrence graph. The oracle replays it as a recursive CTE
    // accumulating (node, d) pairs and taking MIN(d) — level-order
    // first-reach on the Spark side must equal the min over all walks.
    "q211_bfs_distances" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_orderkey") % 3 === 0)
        .select(pmod(col("l_orderkey"), lit(2000)).as("u"),
          (pmod(col("l_partkey").cast("long"), lit(2000)) + 100000).as("v"))
      val edges = li.unionByName(li.select(col("v").as("u"), col("u").as("v")))
      val sources = li.select(col("u").as("node"))
        .where(pmod(col("node"), lit(500)) === 0).distinct()
      graft.operators.Bfs.distances(edges, "u", "v", sources, "node", maxHops = 4)
    }),

    // Bounded-relative-error quantile sketch (DDSketch/HdrHistogram
    // family, integer power-of-two form — see Stats.relQuantiles):
    // per-flag p50/p90/p99 of price cents from O(keys × buckets)
    // mergeable state instead of O(distinct values). The whole sketch
    // is shifts + bit-length — no floating log — so the oracle replays
    // it HASH-EXACTLY: an approximate operator graded exactly.
    "q214_rel_quantile_sketch" -> ((s, dir) => {
      val src = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100).as("v"))
      graft.operators.Stats.relQuantiles(src, "l_returnflag", "v",
        qs = Seq(0.5, 0.9, 0.99), subBits = 7)
    }),

    // Inverse quantile (CDF probes) from the SAME bucket sketch as
    // q214: per-flag rank of three literal price probes — rows whose
    // bucket is at-or-below each probe's bucket — from O(keys ×
    // buckets) state with no extra data pass; integer-exact, so the
    // oracle replays ranks hash-identically.
    "q222_rel_rank_probes" -> ((s, dir) => {
      val src = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100).as("v"))
      graft.operators.Stats.relRanks(src, "l_returnflag", "v",
        probes = Seq(1000000L, 5000000L, 9000000L), subBits = 7)
    }),

    // Weighted shortest costs (bounded Bellman-Ford, frontier-
    // optimized — operators/Bfs.weightedCosts): min cost over walks of
    // at most 3 edges from the source set, integer edge weights
    // derived deterministically from the data. The oracle enumerates
    // the same bounded walks as a recursive CTE and takes MIN(cost).
    "q224_weighted_shortest" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_orderkey") % 5 === 0)
        .select(pmod(col("l_orderkey"), lit(2000)).as("u"),
          (pmod(col("l_partkey").cast("long"), lit(2000)) + 100000).as("v"),
          (pmod(col("l_partkey").cast("long"), lit(9)) + 1).as("w"))
      val edges = li.unionByName(
        li.select(col("v").as("u"), col("u").as("v"), col("w")))
      val sources = li.select(col("u").as("node"))
        .where(pmod(col("node"), lit(500)) === 0).distinct()
      graft.operators.Bfs.weightedCosts(edges, "u", "v", "w",
        sources, "node", maxHops = 3)
    }),

    // Fuzzy record linkage under the native Jaro-Winkler expression
    // (q112's shape with the prefix-boosted metric record linkage
    // actually uses — transposed/dropped characters in the dirty names
    // score high where Levenshtein punishes them). Similarity is
    // decimal-pinned at scale 9 BEFORE the threshold and the argmax,
    // so DuckDB's jaro_winkler_similarity (bit-matched semantics)
    // replays the identical selection.
    "q212_jaro_link" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val dirty = cust.where(col("c_custkey") % 37 === 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0,
            concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 1),
              substring(col("c_name"), 10, 1), substring(col("c_name"), 12, 100000)))
            .when(col("c_custkey") % 3 === 1,
              concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 100000)))
            .otherwise(concat(col("c_name"), lit(" llc"))).as("dirty_name"),
          col("c_nationkey"))
      graft.operators.EntityResolution.resolveJaro(
          dirty, "c_custkey", "dirty_name",
          cust, "c_custkey", "c_name",
          blockCol = "c_nationkey", minSim = 0.9)
        .select(col("d_id"), col("d_name"), col("c_id"),
          col("c_name_").as("match_name"), col("sim"),
          (col("d_id") === col("c_id")).as("hit"))
    }),

    // NOT IN with a nullable subquery column — the null-aware anti join
    // (a plain left_anti is WRONG here if the subquery can yield NULL).
    // The nullif-style guard can't be optimizer-proven non-null, so the
    // plan must keep the null-aware branch; PlanShapeSpec pins it.
    "q126_null_aware_anti" -> ((s, dir) => {
      t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .createOrReplaceTempView("q126_cust")
      t(s, dir, "orders")
        .where(col("o_totalprice") > 400000) // "has no large order"
        .select(when(col("o_custkey") === -1, lit(null))
          .otherwise(col("o_custkey")).as("k"))
        .createOrReplaceTempView("q126_ord")
      s.sql("""SELECT c_custkey, c_name, c_acctbal FROM q126_cust
               WHERE c_custkey NOT IN (SELECT k FROM q126_ord)""")
    }),

    // Per-node triangle counts on a sparsified derived graph: canonical
    // a<b<c enumeration — two edge-keyed joins, all-integer, exactly
    // one tuple per triangle — so the oracle replays the same joins.
    "q121_triangles" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .where(pmod(col("event_id"), lit(11)) === 0)
        .select(pmod(col("user_id"), lit(300)).as("src"),
          pmod(col("event_id") * 7, lit(300)).as("dst"))
      graft.operators.Triangles.perNode(edges, "src", "dst")
    }),

    // Hierarchy flattening (the WITH RECURSIVE shape): parent-pointer
    // tree over customer keys (parent = k/10), flattened to
    // root/depth/path by depth-bounded iterative hops. The oracle IS a
    // recursive CTE — the capability gap this operator closes.
    "q122_hierarchy" -> ((s, dir) => {
      val edges = t(s, dir, "customer")
        .where(col("c_custkey") >= 10)
        .select(col("c_custkey").as("child"),
          floor(col("c_custkey") / 10).as("parent"))
      graft.operators.Hierarchy.flatten(edges, "child", "parent", maxDepth = 10)
    }),

    // Label propagation communities on the same derived graph as q104:
    // 3 synchronous rounds, most-frequent-neighbor label with min-label
    // ties — all-integer state, exact unrolled-CTE replay.
    "q111_label_prop" -> ((s, dir) => {
      val edges = t(s, dir, "events")
        .select(pmod(col("user_id"), lit(500)).as("src"),
          pmod(floor(col("value")), lit(500)).as("dst"))
      graft.operators.LabelProp.run(edges, "src", "dst", iterations = 3)
    }),

    // Fuzzy entity resolution: a deterministic "dirty registry" (three
    // typo classes by key mod — the q66 perturbation device) resolved
    // back against customers. Blocked on the preserved nation key,
    // Levenshtein-scored, per-record argmin. `hit` marks links that
    // recovered the true source record.
    "q112_entity_resolution" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val dirty = cust.where(col("c_custkey") < 1000)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0, replace(col("c_name"), lit("0"), lit("O")))
            .when(col("c_custkey") % 3 === 1, substring(col("c_name"), 2, 1000000))
            .otherwise(concat(col("c_name"), lit(" inc"))).as("dirty_name"),
          col("c_nationkey"))
      graft.operators.EntityResolution.resolve(
          dirty, "c_custkey", "dirty_name",
          cust, "c_custkey", "c_name",
          blockCol = "c_nationkey", maxDist = 8)
        .select(col("d_id"), col("d_name"), col("c_id"),
          col("c_name_").as("match_name"), col("dist").cast("long").as("dist"),
          (col("d_id") === col("c_id")).as("hit"))
    }),

    // k-anonymity generalization ladder: quasi-identifier (segment,
    // nation) groups below k get their MEMBER ROWS re-aggregated one
    // rung up the hierarchy (nation -> region, the tiny broadcast dim)
    // — distinct-sensitive counts can't be merged from the level-0
    // aggregates, so the recompute-from-rows shape is the correct one.
    // Output: surviving QI groups per generalization level with size,
    // sensitive-value diversity, and the k verdict. All integer.
    "q119_k_anonymity" -> ((s, dir) => {
      val k = 10
      val cust = t(s, dir, "customer").select(
        col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("long").as("nat"),
        floor(col("c_acctbal") / 100).cast("long").as("sens"))
      val g0 = cust.groupBy(col("seg"), col("nat"))
        .agg(count(lit(1)).as("n"), countDistinct(col("sens")).as("n_sens"))
      val ok = g0.where(col("n") >= k)
        .select(col("seg"), col("nat").as("qi"), lit(0).as("gen_level"),
          col("n"), col("n_sens"), lit(true).as("k_ok"))
      val badKeys = g0.where(col("n") < k).select(col("seg"), col("nat"))
      val regions = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nat"),
        col("n_regionkey").cast("long").as("reg"))
      val g1 = cust.join(broadcast(badKeys), Seq("seg", "nat"), "left_semi")
        .join(broadcast(regions), Seq("nat"))
        .groupBy(col("seg"), col("reg"))
        .agg(count(lit(1)).as("n"), countDistinct(col("sens")).as("n_sens"))
        .select(col("seg"), col("reg").as("qi"), lit(1).as("gen_level"),
          col("n"), col("n_sens"), (col("n") >= k).as("k_ok"))
      ok.unionByName(g1)
    }),

    // Cohort retention triangle: users bucketed by first-active day,
    // counted in each later day they act — two window passes over one
    // user-keyed shuffle, then an O(days^2) aggregate.
    "q105_cohort_retention" -> ((s, dir) =>
      graft.operators.Funnel.cohortRetention(
        t(s, dir, "events"), "user_id", "ts", periodSec = 86400L)),

    // Global sort + limit => TakeOrderedAndProject (no full sort at scale).
    "q36_top_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // ROLLUP grouping sets (subtotals + grand total).
    "q37_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          NumFns.stableRound(sum(col("l_extendedprice")), 2).as("total"))
    }),

    // PIVOT: event_type domain to columns, one aggregate per cell.
    "q38_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "purchase", "error", "signup", "view"))
        .agg(NumFns.stableRound(sum(col("value")), 4))
    }),

    // Scalar string functions: case, substring, concat, LIKE, position.
    "q39_string_fns" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
          col("p_name").like("%green%").as("is_green"),
          instr(col("p_type"), "BRASS").cast("long").as("brass_pos"),
          length(col("p_name")).cast("long").as("name_len"))
    }),

    // Date parts on the order dates.
    "q40_date_fns" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"))
    }),

    // Approximate sketches: HLL distinct + quantile sketch. Sketch
    // internals are engine-specific, so the oracle pins them through
    // exact error bounds computed in the same query: the HLL estimate
    // within 3x its 5% rsd of the exact distinct count, and the exact
    // rank of each approx-quantile VALUE within +/-0.01 of its target
    // rank (10x the accuracy=1000 sketch's guarantee). The rank pass is
    // partial-agg friendly (no exact percentile buffering — q30 covers
    // that trade).
    "q41_approx_sketches" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_orderkey"),
        col("l_extendedprice"))
      // sketches and the exact distinct count are SEPARATE aggregations:
      // countDistinct in the same agg would Expand the input and build
      // one sketch buffer per (flag, orderkey) distinct key instead of
      // per flag — measured 10x slower. One quantile sketch serves both
      // probes (element_at after the agg).
      val sketches = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("_hll"),
          percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95)), lit(1000)).as("_pq"))
        .select(col("l_returnflag"), col("_hll"),
          element_at(col("_pq"), 1).as("_p50"), element_at(col("_pq"), 2).as("_p95"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_exact"))
      // no persist: both consumers sit in the same returned plan, the
      // frame is 3 rows, and a query-scoped cache would outlive the
      // query (nothing here runs after materialization to unpersist it)
      val approx = sketches.join(exact, Seq("l_returnflag"))
      val ranks = li.select(col("l_returnflag").as("_rf"), col("l_extendedprice"))
        .join(broadcast(approx.select(col("l_returnflag").as("_rf"), col("_p50"), col("_p95"))),
          Seq("_rf"))
        .groupBy(col("_rf"))
        .agg(avg((col("l_extendedprice") <= col("_p50")).cast("double")).as("_r50"),
          avg((col("l_extendedprice") <= col("_p95")).cast("double")).as("_r95"))
      approx.join(ranks, col("l_returnflag") === col("_rf"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("_hll") - col("n_exact")) <= col("n_exact") * 0.15).as("hll_ok"),
          (abs(col("_r50") - 0.5) <= 0.01).as("p50_ok"),
          (abs(col("_r95") - 0.95) <= 0.01).as("p95_ok"))
    }),

    // Binned range join: purchases within the 2h window before each
    // error event, counted per event — equi-join on (key, time bin), no
    // range-theta NLJ.
    "q43_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      graft.operators.RangeJoin.countInWindow(
          errors.withColumnRenamed("user_id", "u"), purchases.withColumnRenamed("p_user", "u"),
          "u", "ts", "p_ts", windowUs = 2L * 3600 * 1000000, outCol = "n_recent")
        .select(col("event_id"), col("u").as("user_id"), col("n_recent"))
    }),

    // LEFT OUTER join with null-fill: per-customer order stats
    // including order-less customers.
    "q44_outer_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ords = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          NumFns.stableRound(sum(col("o_totalprice")), 2).as("spent"))
      cust.join(ords, cust("c_custkey") === ords("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spent"), lit(0.0)).as("spent"))
    }),

    // Bounded rolling-frame window: 7-row moving average per key (the
    // time-series smoothing shape; frame-bounded, not unbounded).
    "q59_moving_avg" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id").rowsBetween(-6, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          NumFns.stableRound(avg(col("value")).over(w), 6).as("mov_avg"))
    }),

    // Cumulative window aggregation per key (running total).
    "q45_running_sum" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          NumFns.stableRound(sum(col("value")).over(w), 4).as("running_total"))
    }),

    // Bivariate statistics: Pearson correlation + sample covariance.
    "q49_corr" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(NumFns.stableRound(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          NumFns.stableRound(covar_samp(col("l_discount"), col("l_tax")), 6).as("disc_tax_cov"))
    }),

    // Histogram bucketing: width_bucket counts over the value domain.
    "q50_histogram" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(width_bucket(col("value"), lit(0.0), lit(200.0), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n"),
          NumFns.stableRound(avg(col("value")), 4).as("avg_v"))
    }),

    // Skew-salted join, oracle-pinned equal to the PLAIN join: salting
    // must be invisible in the result — the (key, salt) equi-join with a
    // salts-replicated dim spreads each hot key over `salts` reducers
    // without changing a single output row.
    "q56_salted_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_extendedprice"))
      val dim = t(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(fact, dim, "okey", salts = 16)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          NumFns.stableRound(sum(col("l_extendedprice")), 2).as("total"))
    }),

    // Hot-key-ONLY salted join — the 100 TB refinement of q56: full-dim
    // replication taxes every key with salts× duplication, so only the
    // DETECTED hot keys (>5% of the fact each; the detection agg's
    // result is bounded by 1/minFrac) take the salted path, with just
    // their dim rows replicated; the cold remainder joins untouched.
    // The fact synthesizes one genuinely hot key (~30% of rows fold
    // onto orderkey 1 — the detector must find exactly it), and the
    // oracle is the PLAIN join over the same mapping: the two-path
    // split must be invisible row-for-row.
    "q191_skew_hot_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
        .select(when(pmod(col("l_orderkey"), lit(10)) < 3, 1L)
          .otherwise(col("l_orderkey")).as("okey"), col("l_extendedprice"))
      val dim = t(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoinHot(fact, dim, "okey",
          minFrac = 0.05, salts = 16)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          NumFns.stableRound(sum(col("l_extendedprice")), 2).as("total"))
    }),

    // Stratified sampling (per-key Bernoulli fractions): the corpus
    // downsampling shape. Sampling is seeded RNG — not SQL-replayable —
    // so the oracle pins the exact per-stratum rate bound: at ~20%
    // fractions the realized rate must sit within 2% absolute (7+
    // standard deviations) of the target.
    "q57_stratified_sample" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag"))
      val fractions = Map("A" -> 0.2, "N" -> 0.1, "R" -> 0.3)
      val sampled = li.stat.sampleBy("l_returnflag", fractions, seed = 42L)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("_k"))
      val totals = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("_n"))
      val target = s.createDataFrame(fractions.toSeq).toDF("l_returnflag", "_f")
      sampled.join(totals, Seq("l_returnflag")).join(broadcast(target), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          (abs(col("_k").cast("double") / col("_n") - col("_f")) <= 0.02).as("rate_ok"))
    }),

    // CUBE grouping sets: all four (flag, status) subtotal combinations.
    "q52_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          NumFns.stableRound(sum(col("l_quantity")), 2).as("qty"))
    }),

    // UNPIVOT (wide -> long): three measure columns melt into
    // (metric, val) rows — the Dataset.unpivot generator.
    "q53_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "val")
    }),

    // Date-spine gap fill + last-observation-carried-forward: the
    // time-series resample shape. The spine and the LOCF window are
    // O(days) — a single-partition window over the calendar is fine by
    // construction (document: partition by series key when filling many
    // series).
    "q54_gap_fill" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .where(col("o_totalprice") > 400000 &&
          to_date(col("o_orderdate")).between("1995-01-01", "1995-03-31"))
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(max(col("o_totalprice")).as("v"))
      val spine = s.range(90)
        .select(date_add(lit("1995-01-01").cast("date"), col("id").cast("int")).as("d"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      spine.join(daily, Seq("d"), "left")
        .select(col("d").cast("string").as("d"), col("v"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
    }),

    // Rank-family windows: percent_rank / cume_dist / ntile quartiles
    // (deterministic total order via the orderkey tiebreak).
    "q55_rank_family" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).cast("long").as("quartile"))
    }),

    // IVF ANN: deterministic coarse centroids, 3-of-8 cell probe. The
    // whole inverted-file pipeline is plain cosine arithmetic, so the
    // oracle replays it end-to-end (assignment argmin, probe set,
    // per-cell scoring, top-k) and the result is hash-exact.
    "q48_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb.where(col("vec_id") >= 100 && col("vec_id") < 120), emb,
          k = 5, nCells = 8, nProbe = 3)
        .select(col("qid"), col("nid"), col("sim"), col("rnk"))
    }),

    // ANN scale path: LSH-bucketed top-k. Hyperplanes are integer-LCG
    // derived (no engine hash), so the oracle replays signature,
    // bucketing, and ranking bit-for-bit.
    "q42_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshBucketTopK(emb.where(col("vec_id") < 20), emb, k = 5, nBits = 4)
        .select(col("qid"), col("nid"), col("sim"), col("rnk"))
    }),

    // Bloom-pruned semi-join: the selective dim side's key set becomes
    // one merged bloom filter (O(numBits), built by a partial-combined
    // aggregate and materialized the same way the built-in runtime
    // filter does: to the driver, then applied as a literal predicate);
    // the fact side is pruned BEFORE the join shuffle. Bloom filters
    // have no false negatives, so the final exact join result is
    // hash-identical to the unpruned semi-join — which is exactly what
    // the oracle asserts (the q56 stance: the optimization must be
    // invisible in the result). BloomPruneSpec pins the pruning
    // effectiveness itself (false-positive survivors stay rare).
    "q62_bloom_semi_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
      val hot = t(s, dir, "orders").where(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.BloomPrune.semiPrune(li, hot, "l_orderkey", "o_orderkey",
          expectedItems = 100000L, numBits = 1L << 20)
        .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          NumFns.stableRound(sum(col("l_extendedprice")), 2).as("revenue"))
    }),

    // Count-min sketch heavy-hitter probing: one mergeable sketch per
    // group (the built-in count_min_sketch aggregate — at scale a
    // partial-combined O(eps^-1 · ln δ^-1) buffer per group, never the
    // raw keys), probed through the native CmsEstimate expression. The
    // sketch internals are engine-specific, so the oracle pins the CMS
    // guarantees the estimates must satisfy: estimate >= exact count
    // (CMS never undercounts — deterministic), and estimate <= exact +
    // 2·eps·N with eps = 0.001 at confidence 0.99. The guarantee is
    // per-probe 99%, and ~190 probes are graded, so the bound carries a
    // 2x safety factor (measured realized max excess: 0.6x eps·N at
    // sf0.01, 0.57x at sf0.1 with this seed — the factor guards data
    // regeneration, same stance as q41's 3x-rsd HLL bound).
    "q61_cms_heavy_hitters" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_orderkey"))
      val sketches = li.groupBy(col("l_returnflag"))
        .agg(expr("count_min_sketch(l_orderkey, 0.001d, 0.99d, 42)").as("_sk"),
          count(lit(1)).as("_n"))
      val exact = li.where(col("l_orderkey") <= 64)
        .groupBy(col("l_returnflag"), col("l_orderkey"))
        .agg(count(lit(1)).as("n_exact"))
      exact.join(broadcast(sketches), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("l_orderkey"), col("n_exact"),
          (graft.expressions.CmsEstimate(col("_sk"), col("l_orderkey")) >= col("n_exact"))
            .as("cms_lower_ok"),
          (graft.expressions.CmsEstimate(col("_sk"), col("l_orderkey")) <=
            col("n_exact") + ceil(col("_n") * 0.002)).as("cms_upper_ok"))
    }),

    // Bucketed co-located layout, graded on the READ side: both sides
    // are written ONCE as co-bucketed sorted tables (the write-time
    // shuffle is the only shuffle that ever happens for this key), then
    // the join AND the aggregation on the bucket key run with zero
    // exchange — the 100 TB answer to "this fact table joins on the
    // same key in every query". The merge hint pins the sort-merge path
    // so the co-location is actually exercised (a broadcast of the dim
    // side would ignore the layout); grouping by (c_custkey,
    // c_mktsegment) still needs no shuffle because hash(c_custkey)
    // already clusters any key set that contains it. PlanShapeSpec
    // asserts the executed plan of THIS graded query contains no
    // Exchange node of any kind.
    //
    // The layout is content-keyed (table/path = md5 of the source dir):
    // the first invocation per (JVM, sfDir) materializes it, every later
    // one — including bench rounds 2..n, whose MEDIAN is therefore the
    // pure read path — reuses it, and re-runs overwrite the SAME paths
    // instead of accumulating run-unique scratch dirs and catalog
    // entries (a round-3 leak: nanotime-named tables grew /tmp and the
    // catalog on every execution, and the graded query mostly measured
    // its own write).
    "q60_bucketed_join" -> ((s, dir) => {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val custT = s"q60_cust_$key"
      val ordT = s"q60_ord_$key"
      if (!s.catalog.tableExists(custT) || !s.catalog.tableExists(ordT)) {
        // one-time hygiene: clear scratch dirs left by PRIOR processes
        // (round-3-era nanotime-named leftovers included) — never a dir
        // this JVM wrote (catalog entry may still be live), never this
        // run's key, and never anything recent: a concurrent harness
        // JVM (bench + correctness in parallel, or another sfDir) may
        // still be reading its own layout, so only dirs untouched for
        // an hour are considered stale
        val scratch = new java.io.File("/tmp/graft_bucketed")
        val staleBefore = System.currentTimeMillis() - 60L * 60 * 1000
        Option(scratch.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("q60_") && !q60Tables.contains(f.getName) &&
            !f.getName.endsWith(key) && f.lastModified() < staleBefore)
          .foreach(deleteRecursively)
        q60Tables.add(custT)
        q60Tables.add(ordT)
        // external-path tables: the layout lands under an explicit
        // scratch location, not cwd-relative spark.sql.warehouse.dir, so
        // the query behaves identically no matter where the host runs
        graft.sources.BucketedStore.write(
          t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
          custT, "c_custkey", buckets = 8,
          path = Some(s"/tmp/graft_bucketed/$custT"))
        graft.sources.BucketedStore.write(
          t(s, dir, "orders").select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
          ordT, "c_custkey", buckets = 8,
          path = Some(s"/tmp/graft_bucketed/$ordT"))
      }
      graft.sources.BucketedStore.read(s, custT).hint("merge")
        .join(graft.sources.BucketedStore.read(s, ordT), Seq("c_custkey"))
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          NumFns.stableRound(sum(col("o_totalprice")), 2).as("spent"))
    }),

    // Z-order (Morton) clustering key: the multi-dimensional layout
    // primitive — interleave two keys' bits so range-writing on the
    // code gives every file a tight min/max envelope on BOTH
    // dimensions (LayoutSpec measures the file-skipping win; this
    // grades the code arithmetic itself — a pure shift/and/or fold the
    // oracle replays bit-for-bit from generated integer SQL).
    "q86_zorder_code" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey"),
          graft.operators.Layout.mortonCode(
            col("o_custkey") % 1024, col("o_orderkey") % 1024, bits = 10).as("z"))
        .orderBy(col("z"), col("o_orderkey")).limit(500)
    }),

    // Hilbert layout key — q86's alternative multi-dim clustering code,
    // computed by the native codegen'd expression (a 10-step
    // rotate/flip walk a Column fold can't express without exponential
    // tree blowup). The oracle replays the identical xy2d walk as a
    // recursive CTE — integer-exact in both engines.
    "q208_hilbert_code" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey"),
          graft.operators.Layout.hilbertCode(
            col("o_custkey") % 1024, col("o_orderkey") % 1024, bits = 10).as("h"))
        .orderBy(col("h"), col("o_orderkey")).limit(500)
    }),

    // Two-level HLL sketch ROLLUP (Datasketches): per-(flag,status)
    // segment sketches — what a 100 TB pre-aggregation layer stores —
    // merged up to per-flag estimates WITHOUT touching raw data again.
    // This is the mergeability contract that makes sketches useful at
    // scale (q41 only graded the one-shot estimate); the oracle pins
    // the rolled-up estimate within 5% of exact (default lgK=12 gives
    // ~1.6% relative error, so the bound is ~3 sigma slack).
    "q88_hll_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"))
      val segs = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      val rolled = segs.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("_est"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_exact"))
      rolled.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("_est") - col("n_exact")) <= col("n_exact") * 0.05).as("est_ok"))
    })
  )

  val oracle: Map[String, String] = Map(

    // The per-fact correlated probe the ENGINE must never run — here it
    // is the definitional truth the one-shuffle as-of must match.
    "q143_point_in_time" ->
      s"""WITH ch AS (
            SELECT c_custkey AS k, DATE '1995-01-01' AS vf,
                   c_acctbal + 0.0 AS f FROM customer
            UNION ALL SELECT c_custkey, DATE '1997-01-01', c_acctbal + 100.0
            FROM customer
            UNION ALL SELECT c_custkey, DATE '1999-01-01', c_acctbal + 200.0
            FROM customer),
          o AS (SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
                o_totalprice AS p FROM orders),
          j AS (SELECT o.d, o.p,
                (SELECT f FROM ch WHERE ch.k = o.k AND ch.vf <= o.d
                 ORDER BY vf DESC LIMIT 1) AS f
                FROM o)
          SELECT CAST(year(d) AS BIGINT) AS yr, COUNT(*) AS n,
            ${SqlFragments.r15("SUM(p)", 2)} AS total_p,
            ${SqlFragments.r15("SUM(f)", 2)} AS total_f
          FROM j GROUP BY yr""",

    // quantile_cont == the engine's exact interpolated percentile (the
    // q51 device); both engines gate on the r15'd med/mad.
    "q147_mad_outliers" ->
      s"""WITH cust AS (SELECT c_nationkey AS k,
            CASE WHEN c_custkey % 97 = 0 THEN c_acctbal * 50
                 ELSE c_acctbal END AS v
            FROM customer),
          med AS (SELECT k, ${SqlFragments.r15("quantile_cont(v, 0.5)", 6)} AS med
                  FROM cust GROUP BY k),
          d AS (SELECT cust.k, v, med FROM cust JOIN med USING (k)),
          mad AS (SELECT k,
                  ${SqlFragments.r15("quantile_cont(abs(v - med), 0.5)", 6)} AS mad
                  FROM d GROUP BY k)
          SELECT CAST(d.k AS BIGINT) AS nation, COUNT(*) AS n,
            CAST(SUM(CASE WHEN abs(0.6745 * (v - med) / mad) > 3.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
            MIN(med) AS med, MIN(mad.mad) AS mad
          FROM d JOIN mad USING (k) GROUP BY d.k""",

    // Spark unix_timestamp truncates to whole seconds; DuckDB epoch()
    // is fractional DOUBLE -> floor before the period division.
    "q105_cohort_retention" ->
      """WITH p AS (SELECT user_id,
             CAST(floor(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS DOUBLE) / 86400)
                  AS BIGINT) AS per
           FROM events),
         c AS (SELECT user_id, per, MIN(per) OVER (PARTITION BY user_id) AS cohort_period
               FROM p),
         d AS (SELECT DISTINCT user_id, cohort_period, per - cohort_period AS period_offset
               FROM c)
         SELECT cohort_period, period_offset, CAST(COUNT(*) AS BIGINT) AS n_users
         FROM d GROUP BY cohort_period, period_offset""",

    "q103_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                     FROM events WHERE event_id % 11 = 0),
         s1 AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
                FROM ev GROUP BY user_id),
         s2 AS (SELECT ev.user_id, MIN(ts) AS t2 FROM ev JOIN s1 USING (user_id)
                WHERE event_type = 'click' AND ts > t1 GROUP BY ev.user_id),
         s3 AS (SELECT ev.user_id, MIN(ts) AS t3 FROM ev JOIN s2 USING (user_id)
                WHERE event_type = 'purchase' AND ts > t2 GROUP BY ev.user_id)
         SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
                CAST(COUNT(t1) AS BIGINT) AS n_users FROM s1
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(t2) AS BIGINT) FROM s2
         UNION ALL
         SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(t3) AS BIGINT) FROM s3""",

    // the biased walk unrolled: uniform step 1, then two biased steps
    // (same dyadic weights, same nbr-ordered cumulative inverse-CDF)
    "q260_node2vec_walks" ->
      """WITH e AS (SELECT DISTINCT user_id % 500 AS src,
                    CAST(floor("value") AS BIGINT) % 500 AS dst FROM events),
         adj AS (SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk
                 FROM e),
         deg AS (SELECT src, COUNT(*) AS deg FROM adj GROUP BY src),
         w0 AS (SELECT src AS start, src AS node FROM deg),
         w1 AS (
           SELECT w0.start, a.dst AS node, w0.node AS prev
           FROM w0 JOIN deg d ON d.src = w0.node
           JOIN adj a ON a.src = w0.node
            AND a.rnk = (((w0.node + 1000003) % 2147483648)
                         * 1103515245 + 12345) % 2147483648 % d.deg),
         c2 AS (
           SELECT w1.start, w1.node, w1.prev, a.dst,
             CASE WHEN a.dst = w1.prev THEN 0.5
                  WHEN e2.src IS NOT NULL THEN 1.0
                  ELSE 0.25 END AS w
           FROM w1 JOIN adj a ON a.src = w1.node
           LEFT JOIN e e2 ON e2.src = w1.prev AND e2.dst = a.dst),
         s2 AS (
           SELECT start, node, prev, dst,
             SUM(w) OVER (PARTITION BY start ORDER BY dst) AS cum,
             ((CAST((((node + 2 * 1000003) % 2147483648)
                     * 1103515245 + 12345) % 2147483648 AS DOUBLE) + 0.5)
              / 2147483648.0) * SUM(w) OVER (PARTITION BY start) AS thr
           FROM c2),
         w2 AS (
           SELECT start, dst AS node, node AS prev FROM s2
           WHERE cum >= thr
           QUALIFY ROW_NUMBER() OVER (PARTITION BY start ORDER BY cum) = 1),
         c3 AS (
           SELECT w2.start, w2.node, w2.prev, a.dst,
             CASE WHEN a.dst = w2.prev THEN 0.5
                  WHEN e2.src IS NOT NULL THEN 1.0
                  ELSE 0.25 END AS w
           FROM w2 JOIN adj a ON a.src = w2.node
           LEFT JOIN e e2 ON e2.src = w2.prev AND e2.dst = a.dst),
         s3 AS (
           SELECT start, node, prev, dst,
             SUM(w) OVER (PARTITION BY start ORDER BY dst) AS cum,
             ((CAST((((node + 3 * 1000003) % 2147483648)
                     * 1103515245 + 12345) % 2147483648 AS DOUBLE) + 0.5)
              / 2147483648.0) * SUM(w) OVER (PARTITION BY start) AS thr
           FROM c3),
         w3 AS (
           SELECT start, dst AS node, node AS prev FROM s3
           WHERE cum >= thr
           QUALIFY ROW_NUMBER() OVER (PARTITION BY start ORDER BY cum) = 1)
         SELECT start, node, 0 AS step FROM w0
         UNION ALL SELECT start, node, 1 FROM w1
         UNION ALL SELECT start, node, 2 FROM w2
         UNION ALL SELECT start, node, 3 FROM w3""",

    // the walk recursion replayed: same ranked adjacency, same LCG
    // pick (all operands non-negative, so % == pmod)
    "q254_random_walks" ->
      """WITH RECURSIVE e AS (SELECT DISTINCT user_id % 500 AS src,
                  CAST(floor("value") AS BIGINT) % 500 AS dst FROM events),
         adj AS (SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk
                 FROM e),
         deg AS (SELECT src, COUNT(*) AS deg FROM adj GROUP BY src),
         walk AS (
           SELECT src AS start, src AS node, 0 AS step FROM deg
           UNION ALL
           SELECT w.start, a.dst, w.step + 1
           FROM walk w
           JOIN deg d ON d.src = w.node
           JOIN adj a ON a.src = w.node
            AND a.rnk = (((w.node + (w.step + 1) * 1000003) % 2147483648)
                         * 1103515245 + 12345) % 2147483648 % d.deg
           WHERE w.step < 4)
         SELECT start, node, step FROM walk""",

    // Unrolled 3-iteration PageRank replay. Every numeric literal is
    // CAST to DOUBLE: DuckDB parses bare 0.85 as DECIMAL, whose exact
    // 0.15 differs from the engine's IEEE (1 - 0.85) by one ulp.
    "q104_pagerank" ->
      """WITH e AS (SELECT DISTINCT user_id % 500 AS src,
                    CAST(floor("value") AS BIGINT) % 500 AS dst FROM events),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         n AS (SELECT COUNT(*) AS cnt FROM nodes),
         deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         r0 AS (SELECT node, CAST(1 AS DOUBLE) / cnt AS rank FROM nodes, n),
         c1 AS (SELECT e.dst AS node, SUM(r0.rank / deg.deg) AS m
                FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
                GROUP BY e.dst),
         r1 AS (SELECT nd.node,
                CAST(CAST(printf('%.15g',
                  (1 - CAST(0.85 AS DOUBLE)) / n.cnt +
                  CAST(0.85 AS DOUBLE) * COALESCE(c1.m, CAST(0 AS DOUBLE)))
                  AS DECIMAL(38,9)) AS DOUBLE) AS rank
                FROM nodes nd CROSS JOIN n LEFT JOIN c1 ON nd.node = c1.node),
         c2 AS (SELECT e.dst AS node, SUM(r1.rank / deg.deg) AS m
                FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
                GROUP BY e.dst),
         r2 AS (SELECT nd.node,
                CAST(CAST(printf('%.15g',
                  (1 - CAST(0.85 AS DOUBLE)) / n.cnt +
                  CAST(0.85 AS DOUBLE) * COALESCE(c2.m, CAST(0 AS DOUBLE)))
                  AS DECIMAL(38,9)) AS DOUBLE) AS rank
                FROM nodes nd CROSS JOIN n LEFT JOIN c2 ON nd.node = c2.node),
         c3 AS (SELECT e.dst AS node, SUM(r2.rank / deg.deg) AS m
                FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
                GROUP BY e.dst),
         r3 AS (SELECT nd.node,
                CAST(CAST(printf('%.15g',
                  (1 - CAST(0.85 AS DOUBLE)) / n.cnt +
                  CAST(0.85 AS DOUBLE) * COALESCE(c3.m, CAST(0 AS DOUBLE)))
                  AS DECIMAL(38,9)) AS DOUBLE) AS rank
                FROM nodes nd CROSS JOIN n LEFT JOIN c3 ON nd.node = c3.node)
         SELECT node, rank FROM r3""",

    "q119_k_anonymity" ->
      """WITH cust AS (SELECT c_mktsegment AS seg,
                       CAST(c_nationkey AS BIGINT) AS nat,
                       CAST(floor(c_acctbal / 100) AS BIGINT) AS sens
                       FROM customer),
         g0 AS (SELECT seg, nat, COUNT(*) AS n, COUNT(DISTINCT sens) AS n_sens
                FROM cust GROUP BY 1, 2),
         ok AS (SELECT seg, nat AS qi, CAST(0 AS INT) AS gen_level,
                n, n_sens, TRUE AS k_ok FROM g0 WHERE n >= 10),
         bad AS (SELECT seg, nat FROM g0 WHERE n < 10),
         reg AS (SELECT CAST(n_nationkey AS BIGINT) AS nat,
                 CAST(n_regionkey AS BIGINT) AS reg FROM nation),
         g1 AS (SELECT c.seg, r.reg AS qi, CAST(1 AS INT) AS gen_level,
                COUNT(*) AS n, COUNT(DISTINCT c.sens) AS n_sens,
                COUNT(*) >= 10 AS k_ok
                FROM cust c JOIN bad USING (seg, nat) JOIN reg r ON r.nat = c.nat
                GROUP BY c.seg, r.reg)
         SELECT * FROM ok UNION ALL SELECT * FROM g1""",

    // Same perturbation, block, DP distance, and argmin — all integer
    // and string ops, exact in both engines.
    "q112_entity_resolution" ->
      """WITH dirty AS (
           SELECT c_custkey AS d_id,
             CASE WHEN c_custkey % 3 = 0 THEN replace(c_name, '0', 'O')
                  WHEN c_custkey % 3 = 1 THEN substr(c_name, 2)
                  ELSE c_name || ' inc' END AS d_name,
             c_nationkey
           FROM customer WHERE c_custkey < 1000),
         cand AS (
           SELECT d.d_id, d.d_name, c.c_custkey AS c_id, c.c_name AS match_name,
             CAST(levenshtein(d.d_name, c.c_name) AS BIGINT) AS dist
           FROM dirty d JOIN customer c ON d.c_nationkey = c.c_nationkey
           WHERE levenshtein(d.d_name, c.c_name) <= 8),
         best AS (SELECT d_id, d_name, c_id, match_name, dist,
                  ROW_NUMBER() OVER (PARTITION BY d_id ORDER BY dist, c_id) AS r
                  FROM cand)
         SELECT d_id, d_name, c_id, match_name, dist, d_id = c_id AS hit
         FROM best WHERE r = 1""",

    // quantile_cont is the same type-7 interpolation as exactPercentiles.
    "q127_winsorize" ->
      s"""WITH li AS (SELECT l_returnflag AS k, l_extendedprice AS v FROM lineitem),
          thr AS (SELECT k,
                  ${SqlFragments.r15("quantile_cont(v, 0.05)", 6)} AS lo,
                  ${SqlFragments.r15("quantile_cont(v, 0.95)", 6)} AS hi
                  FROM li GROUP BY k)
          SELECT k, lo, hi, COUNT(*) AS n,
            ${SqlFragments.r15("AVG(v)", 4)} AS mean_raw,
            ${SqlFragments.r15("AVG(LEAST(GREATEST(v, lo), hi))", 4)} AS mean_winsor
          FROM li JOIN thr USING (k) GROUP BY k, lo, hi""",

    // The definitional quadratic dominance check — independent of the
    // sweep formulation under test.
    "q129_skyline" ->
      """WITH pts AS (SELECT p_retailprice AS x, CAST(p_size AS BIGINT) AS y,
                      COUNT(*) AS n_pts
                      FROM part WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
                      GROUP BY 1, 2)
         SELECT x, y, n_pts FROM pts a
         WHERE NOT EXISTS (SELECT 1 FROM pts b
                           WHERE b.x >= a.x AND b.y >= a.y
                             AND (b.x > a.x OR b.y > a.y))""",

    // Direct inequality join — the semantics the binned plan must match.
    "q124_interval_overlap" ->
      """WITH a AS (SELECT o_custkey % 50 AS key, o_orderkey AS a_id,
                    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS a_s
                    FROM orders WHERE o_orderkey % 47 = 0),
         b AS (SELECT l_suppkey % 50 AS bkey,
               l_orderkey * 10 + l_linenumber AS b_id,
               datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS b_s
               FROM lineitem WHERE l_orderkey % 61 = 0)
         SELECT CAST(a.key AS BIGINT) AS key, a_id, b_id,
           CAST(GREATEST(a_s, b_s) AS BIGINT) AS ov_start,
           CAST(LEAST(a_s + 14, b_s + 7) AS BIGINT) AS ov_end,
           CAST(LEAST(a_s + 14, b_s + 7) - GREATEST(a_s, b_s) AS BIGINT) AS ov_len
         FROM a JOIN b ON a.key = b.bkey
           AND GREATEST(a_s, b_s) < LEAST(a_s + 14, b_s + 7)""",

    // Same inequality oracle again — the SQL spelling of the native
    // sweep must be just as invisible as the column-API one.
    "q231_interval_sql" ->
      """WITH a AS (SELECT o_custkey % 50 AS key, o_orderkey AS a_id,
                    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS a_s
                    FROM orders WHERE o_orderkey % 47 = 0),
         b AS (SELECT l_suppkey % 50 AS bkey,
               l_orderkey * 10 + l_linenumber AS b_id,
               datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS b_s
               FROM lineitem WHERE l_orderkey % 61 = 0)
         SELECT CAST(a.key AS BIGINT) AS key, a_id, b_id,
           CAST(GREATEST(a_s, b_s) AS BIGINT) AS ov_start,
           CAST(LEAST(a_s + 14, b_s + 7) AS BIGINT) AS ov_end,
           CAST(LEAST(a_s + 14, b_s + 7) - GREATEST(a_s, b_s) AS BIGINT) AS ov_len
         FROM a JOIN b ON a.key = b.bkey
           AND GREATEST(a_s, b_s) < LEAST(a_s + 14, b_s + 7)""",

    // Same inequality oracle — the state tier (spilled buffer) must be
    // invisible too.
    "q266_interval_spill" ->
      """WITH a AS (SELECT o_custkey % 50 AS key, o_orderkey AS a_id,
                    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS a_s
                    FROM orders WHERE o_orderkey % 47 = 0),
         b AS (SELECT l_suppkey % 50 AS bkey,
               l_orderkey * 10 + l_linenumber AS b_id,
               datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS b_s
               FROM lineitem WHERE l_orderkey % 61 = 0)
         SELECT CAST(a.key AS BIGINT) AS key, a_id, b_id,
           CAST(GREATEST(a_s, b_s) AS BIGINT) AS ov_start,
           CAST(LEAST(a_s + 14, b_s + 7) AS BIGINT) AS ov_end,
           CAST(LEAST(a_s + 14, b_s + 7) - GREATEST(a_s, b_s) AS BIGINT) AS ov_len
         FROM a JOIN b ON a.key = b.bkey
           AND GREATEST(a_s, b_s) < LEAST(a_s + 14, b_s + 7)""",

    // Same inequality oracle — the native sweep must be plan-invisible.
    "q207_interval_native" ->
      """WITH a AS (SELECT o_custkey % 50 AS key, o_orderkey AS a_id,
                    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS a_s
                    FROM orders WHERE o_orderkey % 47 = 0),
         b AS (SELECT l_suppkey % 50 AS bkey,
               l_orderkey * 10 + l_linenumber AS b_id,
               datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS b_s
               FROM lineitem WHERE l_orderkey % 61 = 0)
         SELECT CAST(a.key AS BIGINT) AS key, a_id, b_id,
           CAST(GREATEST(a_s, b_s) AS BIGINT) AS ov_start,
           CAST(LEAST(a_s + 14, b_s + 7) AS BIGINT) AS ov_end,
           CAST(LEAST(a_s + 14, b_s + 7) - GREATEST(a_s, b_s) AS BIGINT) AS ov_len
         FROM a JOIN b ON a.key = b.bkey
           AND GREATEST(a_s, b_s) < LEAST(a_s + 14, b_s + 7)""",

    // The physical path (native point-in-interval sweep) must be
    // invisible against the direct BETWEEN-style join.
    "q210_scd2_pit_join" ->
      """WITH dim0 AS (SELECT DISTINCT o_custkey % 100 AS key,
             datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS vs
             FROM orders WHERE o_orderkey % 11 = 0),
          dim AS (SELECT key, vs,
             lead(vs) OVER (PARTITION BY key ORDER BY vs) AS ve FROM dim0),
          f AS (SELECT l_suppkey % 100 AS fkey,
             l_orderkey * 10 + l_linenumber AS fact_id,
             datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS t
             FROM lineitem WHERE l_orderkey % 31 = 0)
          SELECT CAST(f.fkey AS BIGINT) AS key, fact_id,
            CAST(dim.vs AS BIGINT) AS vs, CAST(dim.vs % 97 AS BIGINT) AS rate
          FROM f JOIN dim ON f.fkey = dim.key
            AND f.t >= dim.vs AND f.t < dim.ve
          WHERE dim.ve IS NOT NULL""",

    // Level-order first-reach == MIN over all bounded walks.
    "q211_bfs_distances" ->
      """WITH RECURSIVE e0 AS (
           SELECT l_orderkey % 2000 AS u, l_partkey % 2000 + 100000 AS v
           FROM lineitem WHERE l_orderkey % 3 = 0),
         e AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
         walk(node, d) AS (
           SELECT DISTINCT u AS node, CAST(0 AS BIGINT) AS d
           FROM e0 WHERE u % 500 = 0
           UNION
           SELECT e.v, w.d + 1 FROM walk w JOIN e ON e.u = w.node
           WHERE w.d < 4)
         SELECT CAST(node AS BIGINT) AS node, MIN(d) AS d
         FROM walk GROUP BY node""",

    // The identical integer sketch walk — the ONE shared fragment
    // (SqlFragments.relQuantileWalk) q214/q215/q216 all grade against.
    "q214_rel_quantile_sketch" ->
      s"""WITH src AS (
           SELECT l_returnflag AS k,
                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
           FROM lineitem WHERE floor(l_extendedprice * 100) >= 1),
         ${SqlFragments.relQuantileWalk("src", "l_returnflag")}""",

    // min over the same bounded walk set; UNION set-dedup on
    // (node, cost, hops) keeps the recursion finite.
    "q224_weighted_shortest" ->
      """WITH RECURSIVE e0 AS (
           SELECT l_orderkey % 2000 AS u, l_partkey % 2000 + 100000 AS v,
                  l_partkey % 9 + 1 AS w
           FROM lineitem WHERE l_orderkey % 5 = 0),
         e AS (SELECT DISTINCT u, v, w FROM
                 (SELECT u, v, w FROM e0
                  UNION ALL SELECT v AS u, u AS v, w FROM e0)),
         walk(node, c, h) AS (
           SELECT DISTINCT u AS node, CAST(0 AS BIGINT) AS c, 0 AS h
           FROM e0 WHERE u % 500 = 0
           UNION
           SELECT e.v, w.c + e.w, w.h + 1 FROM walk w JOIN e ON e.u = w.node
           WHERE w.h < 3)
         SELECT CAST(node AS BIGINT) AS node, MIN(c) AS cost
         FROM walk GROUP BY node""",

    // Probe buckets computed by the same relBucketExpr arithmetic the
    // engine mirrors in Stats.relBucketOf.
    "q222_rel_rank_probes" -> {
      val probes = Seq(1000000L, 5000000L, 9000000L)
      val les = probes.map(p =>
        s"CAST(SUM(CASE WHEN b <= ${SqlFragments.relBucketExpr(p.toString)} " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS le_$p").mkString(",\n           ")
      s"""WITH src AS (
           SELECT l_returnflag AS k,
                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
           FROM lineitem WHERE floor(l_extendedprice * 100) >= 1),
         bb AS (SELECT k, ${SqlFragments.relBucketExpr("v")} AS b FROM src)
         SELECT k AS l_returnflag, COUNT(*) AS n,
           $les
         FROM bb GROUP BY k"""
    },

    // DuckDB's jaro_winkler_similarity implements the identical classic
    // semantics (boost 0.1, prefix cap 4, threshold 0.7 — empirically
    // bit-matched on randomized corpora); both engines pin the score to
    // a scale-9 decimal before the threshold and the argmax.
    "q212_jaro_link" -> {
      val sim = SqlFragments.r15("jaro_winkler_similarity(d_name, c_name)", 9)
      s"""WITH dirty AS (
            SELECT c_custkey AS d_id,
              CASE WHEN c_custkey % 3 = 0 THEN
                     substr(c_name, 1, 9) || substr(c_name, 11, 1) ||
                     substr(c_name, 10, 1) || substr(c_name, 12, 100000)
                   WHEN c_custkey % 3 = 1 THEN
                     substr(c_name, 1, 9) || substr(c_name, 11, 100000)
                   ELSE c_name || ' llc' END AS d_name,
              c_nationkey
            FROM customer WHERE c_custkey % 37 = 0),
          cand AS (
            SELECT d_id, d_name, c.c_custkey AS c_id, c.c_name, $sim AS sim
            FROM dirty JOIN customer c USING (c_nationkey)),
          best AS (
            SELECT *, row_number() OVER (PARTITION BY d_id
              ORDER BY sim DESC, c_id) AS rn
            FROM cand WHERE sim >= 0.9)
          SELECT d_id, d_name, c_id, c_name AS match_name, sim,
            d_id = c_id AS hit
          FROM best WHERE rn = 1"""
    },

    // NOT IN has identical three-valued-logic semantics in DuckDB.
    "q126_null_aware_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_mktsegment = 'BUILDING'
           AND c_custkey NOT IN
               (SELECT CASE WHEN o_custkey = -1 THEN NULL ELSE o_custkey END
                FROM orders WHERE o_totalprice > 400000)""",

    // Same canonical a<b<c triangle enumeration, all-integer.
    "q121_triangles" ->
      """WITH raw AS (SELECT user_id % 300 AS src, (event_id * 7) % 300 AS dst
                      FROM events WHERE event_id % 11 = 0),
         e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
               FROM raw WHERE src <> dst),
         tri AS (SELECT e1.a, e1.b, e2.b AS c
                 FROM e e1 JOIN e e2 ON e2.a = e1.b
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e),
         cnt AS (SELECT node, COUNT(*) AS n_tri FROM
                 (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node)
         SELECT n.node, COALESCE(c.n_tri, 0) AS n_tri
         FROM nodes n LEFT JOIN cnt c USING (node)""",

    // The genuine recursive CTE the Spark operator re-expresses.
    "q122_hierarchy" ->
      """WITH RECURSIVE
         e AS (SELECT c_custkey AS child, c_custkey // 10 AS parent
               FROM customer WHERE c_custkey >= 10),
         -- explicit DISTINCT: inside WITH RECURSIVE DuckDB gives the
         -- "A UNION B" CTE shape recursive-union semantics (no dedup)
         nodes AS (SELECT DISTINCT node FROM
                   (SELECT child AS node FROM e UNION ALL SELECT parent FROM e)),
         walk AS (
           SELECT node, node AS anc, 0 AS depth,
                  CAST(node AS VARCHAR) AS path_csv FROM nodes
           UNION ALL
           SELECT w.node, e.parent, w.depth + 1,
                  w.path_csv || ',' || CAST(e.parent AS VARCHAR)
           FROM walk w JOIN e ON e.child = w.anc
         )
         SELECT w.node, w.anc AS root, CAST(w.depth AS BIGINT) AS depth,
                w.path_csv
         FROM walk w
         WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.child = w.anc)""",

    // 3 unrolled LPA rounds, all-integer — no stabilization anywhere.
    "q111_label_prop" ->
      """WITH e0 AS (SELECT DISTINCT user_id % 500 AS a,
                     CAST(floor("value") AS BIGINT) % 500 AS b FROM events),
         ed AS (SELECT a, b FROM e0 WHERE a <> b),
         e AS (SELECT DISTINCT a, b FROM
               (SELECT a, b FROM ed UNION ALL SELECT b AS a, a AS b FROM ed)),
         lab0 AS (SELECT DISTINCT a AS node, a AS label FROM e),
         f1 AS (SELECT e.a, l.label, COUNT(*) AS cnt
                FROM e JOIN lab0 l ON e.b = l.node GROUP BY e.a, l.label),
         lab1 AS (SELECT a AS node, label FROM
                  (SELECT a, label,
                   ROW_NUMBER() OVER (PARTITION BY a ORDER BY cnt DESC, label) AS r
                   FROM f1) WHERE r = 1),
         f2 AS (SELECT e.a, l.label, COUNT(*) AS cnt
                FROM e JOIN lab1 l ON e.b = l.node GROUP BY e.a, l.label),
         lab2 AS (SELECT a AS node, label FROM
                  (SELECT a, label,
                   ROW_NUMBER() OVER (PARTITION BY a ORDER BY cnt DESC, label) AS r
                   FROM f2) WHERE r = 1),
         f3 AS (SELECT e.a, l.label, COUNT(*) AS cnt
                FROM e JOIN lab2 l ON e.b = l.node GROUP BY e.a, l.label),
         lab3 AS (SELECT a AS node, label FROM
                  (SELECT a, label,
                   ROW_NUMBER() OVER (PARTITION BY a ORDER BY cnt DESC, label) AS r
                   FROM f3) WHERE r = 1)
         SELECT node, label, COUNT(*) OVER (PARTITION BY label) AS n_comm
         FROM lab3""",

    "q101_cdc_apply" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
                       WHERE strftime(o_orderdate, '%Y-%m-%d')
                             BETWEEN '1995-01-01' AND '1995-01-31'),
          ch AS (SELECT l_orderkey AS k, l_extendedprice AS p,
                 CASE WHEN l_linenumber % 5 = 0 THEN 'D' ELSE 'U' END AS op,
                 CAST(l_linenumber AS BIGINT) AS seq
                 FROM lineitem
                 WHERE CAST(l_shipdate AS DATE)
                       BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'),
          latest AS (SELECT k, p, op FROM
                     (SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC, p DESC) AS rn
                      FROM ch) WHERE rn = 1)
          SELECT k, p FROM base WHERE k NOT IN (SELECT k FROM latest)
          UNION ALL
          SELECT k, p FROM latest WHERE op = 'U'""",

    "q102_scd2" ->
      """WITH ch AS (SELECT l_orderkey AS k, l_extendedprice AS p,
                     CAST(l_linenumber AS BIGINT) AS seq
                     FROM lineitem WHERE l_orderkey % 13 = 0)
         SELECT k, p, seq AS valid_from,
           LEAD(seq, 1) OVER (PARTITION BY k ORDER BY seq, p) AS valid_to,
           LEAD(seq, 1) OVER (PARTITION BY k ORDER BY seq, p) IS NULL AS is_current
         FROM ch""",
    "q36_top_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q37_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${SqlFragments.r15("SUM(l_extendedprice)", 2)} AS total
          FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q38_pivot" -> {
      def cell(v: String) =
        s"""${SqlFragments.r15(s"SUM(CASE WHEN event_type = '$v' THEN value END)", 4)} AS "$v""""
      s"""SELECT user_id, ${Seq("click", "purchase", "error", "signup", "view").map(cell).mkString(", ")}
          FROM events GROUP BY user_id"""
    },
    "q39_string_fns" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u,
         substring(p_type, 1, 5) AS type5,
         concat_ws('|', p_brand, p_type) AS joined,
         p_name LIKE '%green%' AS is_green,
         CAST(CASE WHEN position('BRASS' IN p_type) IS NULL THEN 0
              ELSE position('BRASS' IN p_type) END AS BIGINT) AS brass_pos,
         LENGTH(p_name) AS name_len
         FROM part""",
    "q40_date_fns" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(day(o_orderdate) AS BIGINT) AS d,
         CAST(quarter(o_orderdate) AS BIGINT) AS q,
         strftime(o_orderdate, '%Y-%m-%d') AS iso
         FROM orders""",
    "q56_salted_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
          ${SqlFragments.r15("SUM(l_extendedprice)", 2)} AS total
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority""",
    "q191_skew_hot_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
          ${SqlFragments.r15("SUM(l_extendedprice)", 2)} AS total
          FROM (SELECT CASE WHEN l_orderkey % 10 < 3 THEN 1
                            ELSE l_orderkey END AS okey, l_extendedprice
                FROM lineitem) f
          JOIN orders ON f.okey = o_orderkey
          GROUP BY o_orderpriority""",
    "q57_stratified_sample" ->
      """SELECT l_returnflag, TRUE AS rate_ok
         FROM (SELECT DISTINCT l_returnflag FROM lineitem)""",
    "q52_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${SqlFragments.r15("SUM(l_quantity)", 2)} AS qty
          FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q53_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric, l_extendedprice AS val
         FROM lineitem WHERE l_orderkey < 2000
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
         FROM lineitem WHERE l_orderkey < 2000
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
         FROM lineitem WHERE l_orderkey < 2000""",
    "q54_gap_fill" ->
      """WITH spine AS (SELECT CAST(d AS DATE) AS d
                        FROM generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY) t(d)),
              daily AS (SELECT o_orderdate AS d, MAX(o_totalprice) AS v
                        FROM orders
                        WHERE o_totalprice > 400000
                          AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
                        GROUP BY 1)
         SELECT strftime(spine.d, '%Y-%m-%d') AS d, v,
           last_value(v IGNORE NULLS) OVER
             (ORDER BY spine.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         FROM spine LEFT JOIN daily ON spine.d = daily.d""",
    "q55_rank_family" ->
      """SELECT o_orderkey, o_orderpriority,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""",
    "q41_approx_sketches" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_exact,
         TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
         FROM lineitem GROUP BY l_returnflag""",
    "q42_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              b AS (SELECT vec_id, v, ${SqlFragments.lshBucketExpr("v", 4)} AS bucket FROM e),
              q AS (SELECT vec_id AS qid, v AS qv, bucket FROM b WHERE vec_id < 20),
              p AS (SELECT q.qid, c.vec_id AS nid,
                    ${SqlFragments.cosineExpr("q.qv", "c.v")} AS sim
                    FROM b c JOIN q USING (bucket) WHERE c.vec_id <> q.qid),
              r AS (SELECT qid, nid, sim,
                    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
                    FROM p)
          SELECT qid, nid, sim, rnk FROM r WHERE rnk <= 5""",
    "q48_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              cents AS (SELECT vec_id AS cell, v AS cv FROM e ORDER BY vec_id LIMIT 8),
              aff AS (SELECT e.vec_id, e.v, cents.cell,
                      ${SqlFragments.cosineExpr("e.v", "cents.cv")} AS cs
                      FROM e CROSS JOIN cents),
              ranked AS (SELECT vec_id, v, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
                         FROM aff),
              corpus AS (SELECT vec_id, v, cell FROM ranked WHERE rn = 1),
              probes AS (SELECT vec_id AS qid, v AS qv, cell FROM ranked
                         WHERE rn <= 3 AND vec_id >= 100 AND vec_id < 120),
              p AS (SELECT probes.qid, corpus.vec_id AS nid,
                    ${SqlFragments.cosineExpr("probes.qv", "corpus.v")} AS sim
                    FROM corpus JOIN probes USING (cell) WHERE corpus.vec_id <> probes.qid),
              r AS (SELECT qid, nid, sim,
                    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
                    FROM p)
          SELECT qid, nid, sim, rnk FROM r WHERE rnk <= 5""",
    "q49_corr" ->
      s"""SELECT l_returnflag,
          ${SqlFragments.r15("corr(l_quantity, l_extendedprice)", 6)} AS qty_price_corr,
          ${SqlFragments.r15("covar_samp(l_discount, l_tax)", 6)} AS disc_tax_cov
          FROM lineitem GROUP BY l_returnflag""",
    "q50_histogram" ->
      // DuckDB 1.0 has no width_bucket; the arithmetic equivalent for
      // bounds [0, 200) with 10 buckets (0 below-range, 11 above)
      s"""SELECT CASE WHEN value < 0.0 THEN 0
                      WHEN value >= 200.0 THEN 11
                      ELSE CAST(FLOOR(value / 20.0) AS BIGINT) + 1 END AS bucket,
          COUNT(*) AS n, ${SqlFragments.r15("AVG(value)", 4)} AS avg_v
          FROM events GROUP BY 1""",
    "q43_range_join" ->
      """SELECT e.event_id, e.user_id,
         (SELECT COUNT(*) FROM events p
          WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
            AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL 2 HOUR
            AND CAST(p.ts AS TIMESTAMP) < CAST(e.ts AS TIMESTAMP)) AS n_recent
         FROM events e WHERE e.event_type = 'error'""",
    "q44_outer_join" ->
      s"""WITH o AS (SELECT o_custkey, COUNT(*) AS n_orders,
                    ${SqlFragments.r15("SUM(o_totalprice)", 2)} AS spent
                    FROM orders GROUP BY o_custkey)
          SELECT c_custkey, c_mktsegment,
            COALESCE(n_orders, 0) AS n_orders, COALESCE(spent, 0.0) AS spent
          FROM customer LEFT JOIN o ON c_custkey = o_custkey""",
    "q59_moving_avg" ->
      s"""SELECT event_id, user_id,
         ${SqlFragments.r15("AVG(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 6)} AS mov_avg
         FROM events""",
    "q45_running_sum" ->
      s"""SELECT event_id, user_id, value,
         ${SqlFragments.r15("SUM(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 4)} AS running_total
         FROM events""",
    "q60_bucketed_join" ->
      s"""SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
          ${SqlFragments.r15("SUM(o_totalprice)", 2)} AS spent
          FROM customer JOIN orders ON o_custkey = c_custkey
          GROUP BY c_custkey, c_mktsegment""",
    "q86_zorder_code" -> {
      // generated bit-interleave: a (custkey) even positions, b odd
      val terms = (0 until 10).flatMap(i => Seq(
        s"((((o_custkey % 1024) >> $i) & 1) << ${2 * i})",
        s"((((o_orderkey % 1024) >> $i) & 1) << ${2 * i + 1})"))
      s"""SELECT o_orderkey, CAST(${terms.mkString(" | ")} AS BIGINT) AS z
          FROM orders ORDER BY z, o_orderkey LIMIT 500"""
    },

    // The exact xy2d walk (Wikipedia formulation) as a recursive CTE:
    // 10 rotate/flip steps, s = 512 … 1, d += s²·((3·rx) XOR ry) —
    // integer arithmetic both engines replay bit-identically.
    "q208_hilbert_code" ->
      """WITH RECURSIVE pts AS (
           SELECT o_orderkey, CAST(o_custkey % 1024 AS BIGINT) AS x1,
                  CAST(o_orderkey % 1024 AS BIGINT) AS y1 FROM orders),
         hw(o_orderkey, x, y, s, d) AS (
           SELECT o_orderkey, x1, y1, CAST(512 AS BIGINT), CAST(0 AS BIGINT)
           FROM pts
           UNION ALL
           SELECT o_orderkey,
             CASE WHEN (y & s) = 0 THEN
               CASE WHEN (x & s) > 0 THEN 1023 - y ELSE y END
             ELSE x END,
             CASE WHEN (y & s) = 0 THEN
               CASE WHEN (x & s) > 0 THEN 1023 - x ELSE x END
             ELSE y END,
             s // 2,
             d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                             (CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END))
           FROM hw WHERE s >= 1)
         SELECT o_orderkey, d AS h FROM hw WHERE s = 0
         ORDER BY h, o_orderkey LIMIT 500""",
    "q88_hll_rollup" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_exact, TRUE AS est_ok
         FROM lineitem GROUP BY l_returnflag""",
    "q61_cms_heavy_hitters" ->
      """SELECT l_returnflag, l_orderkey, COUNT(*) AS n_exact,
         TRUE AS cms_lower_ok, TRUE AS cms_upper_ok
         FROM lineitem WHERE l_orderkey <= 64
         GROUP BY l_returnflag, l_orderkey""",
    "q62_bloom_semi_join" ->
      s"""SELECT l_orderkey, COUNT(*) AS n_lines,
          ${SqlFragments.r15("SUM(l_extendedprice)", 2)} AS revenue
          FROM lineitem
          WHERE EXISTS (SELECT 1 FROM orders
                        WHERE o_orderkey = l_orderkey AND o_totalprice > 450000)
          GROUP BY l_orderkey"""
  )
}
