package graft.queries

import graft.Tables
import graft.functions.NumFns
import graft.serving.{ArxForecaster, ServingJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end lambda-pipeline queries over the testdata: the batch
  * recompute and the serving forecast, run against synthetic
  * news/stock frames derived from `documents`/`lineitem`.
  */
object PipelineQueries {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Deterministic SpeedDelta frame from `events` (tick deltas from one
    * event_type, scored-news deltas from another, seq = event_id fixing
    * the fold order) — shared input of the two graded merge paths
    * (q63 fMGWS, q85 transformWithState).
    */
  private def speedDeltaFrame(s: SparkSession, dir: String) = {
    import s.implicits._
    import graft.model.{SentimentScore, SpeedDelta, Tick}
    val ev = t(s, dir, "events")
      .select(to_date(col("ts")).cast("string").as("d"),
        col("event_id"), col("event_type"), col("value"))
      .as[(String, Long, String, Double)]
    val ticks = ev.filter(_._3 == "purchase").map { case (d, seq, _, v) =>
      SpeedDelta(d, seq, Some(Tick(d,
        open = Some(v + 1.0), high = Some(v + 2.0), low = Some(v - 1.0),
        close = Some(v),
        adjClose = if (v >= 100.0) Some(v) else None,
        volume = if (v >= 50.0) Some(v * 10.0) else None)), None)
    }
    val sents = ev.filter(_._3 == "click").map { case (d, seq, _, v) =>
      SpeedDelta(d, seq, None, Some(SentimentScore(
        pos = v / 200.0, neg = (200.0 - v) / 200.0,
        neu = math.abs(100.0 - v) / 100.0)))
    }
    ticks.union(sents)
  }

  private def speedRowsOut(rows: org.apache.spark.sql.Dataset[graft.model.SpeedRow]) =
    rows.toDF()
      .select(col("date"), col("open"), col("high"), col("low"), col("close"),
        col("adjClose").as("adj_close"), col("volume"),
        col("nbrArticle").as("nbr_article"),
        col("positive"), col("negative"), col("neutral"))

  /** documents -> (Date, Text) news master: deterministic synthetic dates
    * keyed off doc_id (30-day cycle).
    */
  private def newsMaster(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      date_format(date_add(lit("1997-01-01").cast("date"),
        (col("doc_id") % 30).cast("int")), "yyyy-MM-dd").as("Date"),
      col("text").as("Text"))

  /** lineitem daily aggregate -> OHLCV-shaped stock master. */
  private def stockMaster(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(to_date(col("l_shipdate")).between("1997-01-01", "1997-01-30"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("Date"))
      .agg(min(col("l_extendedprice")).as("Low"),
        max(col("l_extendedprice")).as("High"),
        NumFns.stableRound(sum(col("l_extendedprice")), 4).as("Open"),
        NumFns.stableRound(avg(col("l_extendedprice")), 4).as("Close"),
        sum(col("l_quantity")).as("Volume"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §3.1 batch recompute end-to-end: clean -> score -> daily agg ->
    // join stock -> batch_view rows. The oracle replays the identical
    // dataflow in SQL (avgs rounded in both).
    "q25_batch_pipeline" -> ((s, dir) => {
      val agg = graft.batch.BatchPipeline.aggDaily(
        graft.batch.BatchPipeline.scoreNews(
          graft.batch.BatchPipeline.cleanNews(newsMaster(s, dir))))
      graft.batch.BatchPipeline.joinStock(stockMaster(s, dir), agg, today = "1997-01-30")
        .select(col("Date"), col("Open"), col("High"), col("Low"), col("Close"),
          col("Volume"), col("Nbr_article").cast("long").as("Nbr_article"),
          NumFns.stableRound(col("Positive"), 6).as("Positive"),
          NumFns.stableRound(col("Negative"), 6).as("Negative"),
          NumFns.stableRound(col("Neutre"), 6).as("Neutre"))
    }),

    // The WHOLE lambda architecture on the ACID layer, graded as one
    // day-cycle (reference batchPipeline.py:169-180 + twitterConsumer
    // Stream.py:110-127 + prediction.py:82-93, upgraded from ViewStore
    // to SnapshotStore): masters land as snapshot commits (ingest),
    // the batch recompute reads THE STORE and commits batch_view as a
    // new version, today's deltas run the real fMGWS speed merge and
    // land exactly-once (appendOnce; the redelivered batch is a proven
    // no-op), and serving splices a skipping-read of the PINNED batch
    // version with the speed row — the day-boundary handoff the lambda
    // architecture exists for, every layer behind a manifest.
    "q150_lambda_snapshot" -> ((s, dir) => {
      import s.implicits._
      val today = "1997-01-30"
      val root = graft.sources.Scratch.processScoped("q150_lambda", dir)
      graft.sources.Scratch.deleteRecursively(new java.io.File(root))
      val st = new graft.sources.SnapshotStore(s, root)
      // ingest: masters -> snapshot commits
      st.commit("news_master", newsMaster(s, dir), overwrite = true,
        statsCols = Seq("Date"))
      st.commit("stock_master", stockMaster(s, dir), overwrite = true,
        statsCols = Seq("Date"))
      // batch: recompute FROM the store, commit the view
      val bvV = st.commit("batch_view",
        graft.batch.BatchPipeline.run(
          st.read("news_master"), st.read("stock_master"), today),
        overwrite = true, statsCols = Seq("Date"))
      // speed: today's per-article scores + today's tick through the
      // real keyed streaming merge, appended exactly once
      val newsWithId = t(s, dir, "documents").select(
        date_format(date_add(lit("1997-01-01").cast("date"),
          (col("doc_id") % 30).cast("int")), "yyyy-MM-dd").as("Date"),
        col("text").as("Text"), col("doc_id"))
      val sentDeltas = graft.batch.BatchPipeline.scoreNews(
          graft.batch.BatchPipeline.cleanNews(
            newsWithId.where(col("Date") === today)))
        .select(col("Date"), col("doc_id"),
          col("Positive"), col("Negative"), col("Neutre"))
        .as[(String, Long, Double, Double, Double)]
        .map { case (d, id, p, n, u) => graft.model.SpeedDelta(d, id, None,
          Some(graft.model.SentimentScore(p, n, u))) }
      val tickDeltas = stockMaster(s, dir).where(col("Date") === today)
        .select(col("Date"), col("Open"), col("High"), col("Low"),
          col("Close"), col("Volume"))
        .as[(String, Double, Double, Double, Double, Double)]
        .map { case (d, o, h, l, c, v) => graft.model.SpeedDelta(d, 0L,
          Some(graft.model.Tick(d, Some(o), Some(h), Some(l), Some(c),
            Some(c), Some(v))), None) }
      val speedRows = speedRowsOut(
        graft.streaming.SpeedLayer.mergeDeltas(sentDeltas.union(tickDeltas)))
      st.appendOnce("speed_view", speedRows, txnId = 1L, statsCols = Seq("date"))
      require(st.appendOnce("speed_view", speedRows, txnId = 1L).isEmpty,
        "redelivered speed batch must no-op")
      // the day-cycle PUBLISH: one syncpoint pinning batch_view AND
      // speed_view — the serving splice below resolves this single
      // syncpoint, so it is day-cycle-consistent BY CONSTRUCTION (a
      // reader can never see day N's batch view with day M's speed
      // row, the reference's lambda splice anomaly)
      st.publishSync(Map(
        "batch_view" -> bvV,
        "speed_view" -> st.versions("speed_view").max))
      val pins = st.syncPins()
      // serving: skipping read of history AS OF the cycle's pinned
      // batch version + the same cycle's speed row
      val hist = st.readPruned("batch_view", "Date", "1997-01-01", "1997-01-29",
          asOf = Some(pins("batch_view")))
        .select(col("Date").as("date"), col("Close").as("close"),
          col("Nbr_article").cast("long").as("nbr_article"),
          NumFns.stableRound(col("Positive"), 6).as("positive"),
          lit("batch").as("source"))
      val todayRow = st.readSync("speed_view")
        .select(col("date"), col("close"), col("nbr_article"),
          col("positive"), lit("speed").as("source"))
      hist.unionByName(todayRow)
    }),

    // §3.2 speed-layer keyed merge (J2/A3/T7), graded under the oracle:
    // the engine's fold-in-state centerpiece (SpeedLayer.mergeDeltas —
    // reference twitterConsumerStream.py:94-107 upserting sentiment via
    // the EW painless script + yfConsumerStream.py:57-67 last-write-wins
    // OHLCV into the same per-Date doc) run through the EXACT streaming
    // code path (groupByKey + flatMapGroupsWithState + mergeHandler;
    // batch execution of fMGWS folds each key's group once over empty
    // initial state — the same foldInto every micro-batch replays).
    // Deterministic SpeedDelta frames derive from `events`: one
    // event_type becomes the tick stream (OHLCV fields from `value`,
    // adjClose/volume conditionally absent to exercise the per-field
    // last-NON-NULL-wins orElse), another becomes the scored-news stream
    // (pos/neg/neu from `value`); seq = event_id fixes the fold order.
    // The oracle replays last-wins as last(..ORDER BY seq) FILTER, the
    // EW fold as list_reduce(list(..ORDER BY seq)), and Nbr_article as
    // the sentiment count — raw doubles (per-row arithmetic + the same
    // (x+v)/2 chain, identical IEEE ops in both engines).
    "q63_speed_merge" -> ((s, dir) =>
      speedRowsOut(graft.streaming.SpeedLayer.mergeDeltas(speedDeltaFrame(s, dir)))),

    // T5 GRADED: late/out-of-order delivery of the SAME deltas through
    // a REAL two-micro-batch streaming run (MemoryStream + fMGWS state
    // across batches). The stream splits on a seq boundary so every day
    // straddling it arrives "late" in batch 2 and must fold onto
    // batch-1 state; WITHIN each batch delivery order is LCG-scrambled
    // and the handler's seq sort restores it. The last emission per day
    // (max batchId, collected O(days) via foreachBatch — the K6 bound)
    // must therefore hash-match the identical in-order oracle q63 uses:
    // out-of-order + late delivery is invisible in the result.
    "q95_speed_merge_late" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val all = speedDeltaFrame(s, dir).collect().sortBy(_.seq)
      val (b1, b2) = all.splitAt(all.length / 2)
      def scramble(a: Array[graft.model.SpeedDelta]) =
        a.sortBy(d => ((d.seq * 1103515245L + 12345L) % 2147483648L, d.seq)).toSeq
      val mem = MemoryStream[graft.model.SpeedDelta]
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, graft.model.SpeedRow)]
      val q = graft.streaming.SpeedLayer.mergeDeltas(mem.toDS())
        .writeStream.outputMode("append")
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[graft.model.SpeedRow], bid: Long) =>
          buf.synchronized { buf ++= ds.collect().map((bid, _)) }; ()
        }
        .start()
      try {
        mem.addData(scramble(b1)); q.processAllAvailable()
        mem.addData(scramble(b2)); q.processAllAvailable()
      } finally q.stop()
      val finalRows = buf.synchronized {
        buf.groupBy(_._2.date).values.map(_.maxBy(_._1)._2).toSeq
      }
      speedRowsOut(s.createDataset(finalRows))
    }),

    // The q249 forecaster ONLINE: Holt level/trend maintained per key
    // by transformWithState (O(1) state — count, level, trend), fed as
    // a real two-micro-batch stream in date order. The streamed fold
    // must land on the BATCH fit bit-for-bit — graded by the same
    // recursive-CTE oracle as q249 (stream/batch equivalence, the
    // T5-for-forecasting claim; smoothing is order-sensitive, so the
    // harness slices by date, not by scramble).
    "q253_stream_holt" -> ((s0, dir) => {
      // transformWithState needs the RocksDB provider; child session so
      // the conf never leaks into the other streaming queries
      val s = s0.newSession()
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s.conf.set("spark.sql.shuffle.partitions",
        s0.conf.get("spark.sql.shuffle.partitions"))
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val all = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).cast("string").as("d"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("user_id"), col("d")).agg(sum(col("cents")).as("y"))
        .select(col("user_id").as("key"), col("d"),
          col("y").cast("double").as("y"))
        .as[graft.streaming.SeriesPoint].collect()
      val pivot = all.map(_.d).sorted.apply(all.length / 2)
      val (b1, b2) = all.partition(_.d < pivot)
      val mem = MemoryStream[graft.streaming.SeriesPoint]
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, graft.streaming.HoltOut)]
      val q = graft.streaming.Forecast.holtStream(mem.toDS(), 0.5, 0.25)
        .writeStream.outputMode("append")
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[graft.streaming.HoltOut],
                         bid: Long) =>
          buf.synchronized { buf ++= ds.collect().map((bid, _)) }; ()
        }.start()
      try {
        mem.addData(b1.toSeq); q.processAllAvailable()
        mem.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      val fin = buf.synchronized {
        buf.groupBy(_._2.key).values.map(_.maxBy(_._1)._2).toSeq
      }
      s.createDataset(fin).toDF()
        .select(col("key").as("user_id"), col("n"), col("level"),
          col("trend"), explode(sequence(lit(1L), lit(3L))).as("h"))
        .withColumn("yhat",
          col("level") + col("h").cast("double") * col("trend"))
    }),

    // Streaming reservoir sampling — a bounded exact k-sample per key
    // over an unbounded stream, run as a REAL two-micro-batch stateful
    // query (fMGWS, O(k) state per key). Priorities are LCG hashes of
    // the id, so the reservoir is "the k smallest priorities seen" — a
    // set property invariant to arrival order, batch boundaries and
    // replays, which is what lets a DuckDB oracle replay an ONLINE
    // sampler exactly (classic Vitter reservoirs cannot be replayed
    // cross-engine).
    "q162_stream_reservoir" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamSampler
      val all = t(s, dir, "events").select(col("event_type"), col("event_id"))
        .as[(String, Long)].collect().sortBy(_._2)
        .map { case (key, id) => StreamSampler.Item(key, id) }
      val (b1, b2) = all.splitAt(all.length / 2)
      val mem = MemoryStream[StreamSampler.Item]
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, StreamSampler.Sampled)]
      val q = StreamSampler.reservoirK(mem.toDS(), k = 10)
        .writeStream.outputMode("append")
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[StreamSampler.Sampled], bid: Long) =>
            buf.synchronized { buf ++= ds.collect().map((bid, _)) }; ()
        }.start()
      try {
        mem.addData(b1.toSeq); q.processAllAvailable()
        mem.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      val finalRows = buf.synchronized {
        buf.groupBy(_._2.key).values.flatMap { rows =>
          val lastBid = rows.map(_._1).max
          rows.filter(_._1 == lastBid).map(_._2)
        }.toSeq
      }
      s.createDataset(finalRows)
        .select(col("key").as("event_type"), col("id").as("event_id"))
    }),

    // The SAME merge through the modern transformWithState /
    // StatefulProcessor API (T7's second implementation, previously
    // only spec-pinned equal to the fMGWS path) — now hashed by the
    // oracle itself: both state APIs must replay the reference's two
    // upsert scripts identically.
    "q85_speed_merge_tws" -> ((s, dir) =>
      speedRowsOut(graft.streaming.SpeedLayer.mergeDeltasTws(speedDeltaFrame(s, dir)))),

    // T-row extension: stream-stream event-time INTERVAL join, executed
    // as a real streaming query — file source (the events parquet,
    // glob-pathed: FileStreamSource wants a directory or glob, and the
    // glob's non-wildcard prefix becomes the base path), watermarks on
    // both sides, key-equality + time-range predicate (what bounds the
    // join state at scale), Trigger.AvailableNow to completion. The
    // attribution shape: purchase within 24 h after a view by the same
    // user. gap is compared in exact integer microseconds (floor-of-
    // difference vs difference-of-floors diverges in seconds).
    "q71_stream_interval_join" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val raw = graft.Tables.eventsStream(s, dir, Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType)))
      val views = raw.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("view_ts"))
      val buys = raw.where(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id").as("b_user"),
          col("ts").as("buy_ts"))
      graft.streaming.StreamJoin.runAvailableNow(s,
          graft.streaming.StreamJoin.intervalJoin(views, buys,
            "v_user", "b_user", "view_ts", "buy_ts",
            upper = "24 hours", watermark = "1 hour"),
          statePartitions = Some(8))
        .select(col("view_id"), col("buy_id"), col("v_user").as("user_id"),
          (unix_micros(col("buy_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
    }),

    // F4 graded under the oracle: streaming dedup-by-id (the reference
    // drops re-delivered articles by id; Kafka gives at-least-once, so
    // the dedup stage is what makes the pipeline effectively-once).
    // Two file-source reads of the same events parquet union'd = every
    // event delivered twice; dropDuplicatesWithinWatermark(event_id)
    // collapses them with state bounded by the watermark (the unbounded
    // dropDuplicates would hold every id forever — at 100 TB the
    // watermark bound IS the operator). Oracle: the events table
    // itself, since ids are unique at the source.
    "q74_stream_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      def read() = graft.Tables.eventsStream(s, dir, Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType)))
      val doubled = read().union(read()).withWatermark("ts", "1 hour")
      graft.streaming.StreamJoin.runAvailableNow(s,
          doubled.dropDuplicatesWithinWatermark("event_id"),
          statePartitions = Some(8))
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    // T4 graded under the oracle: event-time tumbling-window aggregate
    // as a REAL streaming query in APPEND mode — the mode where the
    // watermark is not a tuning knob but the correctness contract:
    // only windows whose end the final watermark passed may emit.
    // Trigger.AvailableNow processes all data, then runs the extra
    // no-data batch the advanced watermark triggers, so the emitted
    // set is exactly {windows with end <= max(ts) - delay}. The oracle
    // recomputes that cutoff in SQL — the hash match grades Spark's
    // append-emission semantics, not just the sums. (Event-time stats
    // track milliseconds; the cutoff here sits ~57 min from a window
    // edge, so sub-second truncation cannot flip a window.)
    "q76_stream_windowed_agg" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val raw = graft.Tables.eventsStream(s, dir, Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      val agg = raw.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("_sv"))
      graft.streaming.StreamJoin.runAvailableNow(s,
          agg.select(unix_micros(col("window.start")).as("w_start_us"),
            col("event_type"), col("n"),
            NumFns.stableRound(col("_sv"), 4).as("sum_value")),
          statePartitions = Some(8))
    }),

    // Streaming windowed QUANTILES — possible precisely because the
    // relBucket sketch state is an additive count: the streaming
    // engine's windowed agg maintains (window, bucket) counts under
    // the watermark like any sum, and the quantile walk
    // (relQuantilesFromCounts) serves from the materialized closed
    // windows. An exact streaming percentile would need every value in
    // state; the sketch needs O(buckets). Same append-mode emission
    // contract and final-watermark cutoff as q76; integer-exact, so
    // the oracle replays closed windows hash-identically.
    "q216_stream_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val raw = graft.Tables.eventsStream(s, dir, Seq(
        StructField("ts", LongType), StructField("value", DoubleType)))
      val counts = raw.withWatermark("ts", "1 hour")
        .withColumn("v", floor(col("value") * 100))
        .where(col("v") >= 1)
        .groupBy(window(col("ts"), "6 hours"),
          graft.operators.Stats.relBucket(col("v"), 7).as("b"))
        .agg(count(lit(1)).as("c"))
      val mat = graft.streaming.StreamJoin.runAvailableNow(s,
        counts.select(unix_micros(col("window.start")).as("w_us"),
          col("b"), col("c")),
        statePartitions = Some(8))
      graft.operators.Stats.relQuantilesFromCounts(
        mat, "w_us", "b", "c", qs = Seq(0.5, 0.9, 0.99), subBits = 7)
    }),

    // Streaming per-window DISTINCT via HLL sketch state — the q213
    // sketch-as-state pattern on the stream: hll_sketch_agg's binary
    // buffer is mergeable aggregate state, so the windowed agg
    // maintains it under the watermark with O(sketch) state per window
    // where exact streaming distinct would hold every member. Closed
    // windows join the batch-side exact count (inner join = the q76
    // cutoff by construction); estimate gated within 5% (exact in
    // sparse mode at these cardinalities).
    "q218_stream_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val raw = graft.Tables.eventsStream(s, dir, Seq(
        StructField("ts", LongType), StructField("user_id", LongType)))
      val agg = raw.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n"), hll_sketch_agg(col("user_id")).as("sk"))
      val mat = graft.streaming.StreamJoin.runAvailableNow(s,
        agg.select(unix_micros(col("window.start")).as("w_us"), col("n"),
          hll_sketch_estimate(col("sk")).as("_est")),
        statePartitions = Some(8))
      val exact = t(s, dir, "events")
        .select((unix_micros(col("ts").cast("timestamp")) -
          pmod(unix_micros(col("ts").cast("timestamp")), lit(21600000000L)))
          .as("w_us"), col("user_id"))
        .groupBy(col("w_us"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      mat.join(exact, Seq("w_us"))
        .select(col("w_us"), col("n"), col("n_exact"),
          (abs(col("_est") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("est_ok"))
    }),

    // Streaming HOT-KEY detection — the q61/Skew sketch (Misra–Gries
    // candidates + CMS refinement, one mergeable buffer) as streaming
    // state: the global update-mode agg folds every micro-batch into
    // O(1/minFrac + CMS) state, and the LAST update's buffer yields
    // the hot set. Deterministically skewed key (60% mass on key 0,
    // 10% on each of 6..9) with minFrac 0.15: the MG superset
    // guarantee + the eps·n CMS margin make the admitted set exactly
    // the true hot set, so the oracle's exact HAVING replays it.
    "q226_stream_hot_keys" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val raw = graft.Tables.eventsStream(s, dir, Seq(
        StructField("ts", LongType), StructField("user_id", LongType)))
      val keyed = raw.select(
        when(pmod(col("user_id"), lit(10)) < 6, lit(0L))
          .otherwise(pmod(col("user_id"), lit(10))).as("k"))
      val minFrac = 0.15
      val agg = keyed.agg(graft.expressions.HeavyHittersAgg(
        col("k"), graft.operators.Skew.hhCounters(minFrac),
        eps = 1e-3, conf = 0.99).as("hh"))
      val mat = graft.streaming.StreamJoin.runAvailableNow(s,
        agg.select(col("hh.total").as("total"), col("hh.cms").as("cms"),
          col("hh.candidates").as("candidates")),
        statePartitions = Some(1), mode = "update")
      // last update's buffer = the full-stream state; the admission
      // gate is Skew.admitHot — ONE copy shared with the batch path
      graft.operators.Skew.admitHot(
          mat.orderBy(col("total").desc).limit(1), minFrac)
        .select(col("_cand").cast("long").as("k"))
    }),

    // Streaming SESSION windows in append mode (the data-dependent
    // window kind: windows merge as events arrive, close only when the
    // watermark passes last-event + gap). Same emission contract as
    // q76 but the cutoff is per-session — the oracle re-derives each
    // session's end (MAX(ts) + gap) from the lag/cumsum sessionization
    // and applies the final-watermark cutoff. Grades the streaming
    // session-state machinery q31 only grades in batch.
    "q77_stream_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val raw = graft.Tables.eventsStream(s, dir, Seq(
        StructField("ts", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType)))
      val agg = raw.withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          NumFns.stableRound(sum(col("value")), 4).as("sum_value"))
      graft.streaming.StreamJoin.runAvailableNow(s,
          agg.select(col("user_id"),
            unix_micros(col("session_window.start")).as("start_us"),
            col("n_events"), col("sum_value")),
          statePartitions = Some(8))
    }),

    // CHAINED stateful streaming operators in one query (Spark 4's
    // multiple-stateful-operator support): stream-stream interval join
    // feeding an event-time windowed aggregate. The join shifts the
    // downstream watermark by its interval upper bound — view-side
    // rows can keep matching until the buy watermark passes
    // view_ts + 24 h, so the agg's emission cutoff is
    // window_end <= min(max view_ts, max buy_ts) - delay - 24 h,
    // which the oracle recomputes (the hash match pins the watermark
    // PROPAGATION rule through the join, not just the counts;
    // empirically confirmed at sf0.01: 115 of 119 batch windows emit).
    "q80_stream_join_agg" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      def read() = graft.Tables.eventsStream(s, dir, Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType)))
      val views = read().where(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      val buys = read().where(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("ts").as("buy_ts"))
      val joined = graft.streaming.StreamJoin.intervalJoin(views, buys,
        "v_user", "b_user", "view_ts", "buy_ts",
        upper = "24 hours", watermark = "1 hour")
      val agg = joined.groupBy(window(col("view_ts"), "6 hours"))
        .agg(count(lit(1)).as("n_attributed"))
      graft.streaming.StreamJoin.runAvailableNow(s,
          agg.select(unix_micros(col("window.start")).as("w_start_us"),
            col("n_attributed")),
          statePartitions = Some(8))
    }),

    // T2's sibling graded: UPDATE-mode streaming aggregation. Unlike
    // append (q76), update mode emits each key's latest value per
    // micro-batch without waiting for the watermark — the mode the
    // reference's speed view actually needs (upsert-by-key every
    // batch). One source file = one batch, so the emitted set is each
    // key's final aggregate, which the oracle computes as the plain
    // batch GROUP BY — no cutoff, the semantic difference from q76.
    "q81_stream_update_agg" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val raw = graft.Tables.eventsStream(s, dir, Seq(
        StructField("ts", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val agg = raw.withWatermark("ts", "1 hour")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          NumFns.stableRound(sum(col("value")), 4).as("sum_value"))
      graft.streaming.StreamJoin.runAvailableNow(s, agg,
        statePartitions = Some(8), mode = "update")
    }),

    // Stream-STATIC join: the enrichment shape — a live stream joined
    // to a slowly-changing dimension that is just a batch table. No
    // state, no watermark: the static side broadcasts and every
    // micro-batch probes it map-side, which is why this join class is
    // free at scale (the dim re-reads per batch; pin it with a
    // broadcast hint). Users map onto the customer dim by key range.
    // The ACID table AS a stream: readStream.format("graft-table") —
    // the custom DSv1 streaming source whose offsets ARE the store's
    // committed versions (GraftTableSourceProvider). Three runs on ONE
    // checkpoint prove the contract end-to-end: run 1 emits the
    // initial snapshot (one batch), two more commits land, run 2 emits
    // EXACTLY the appended rows (readAppended over the offset range),
    // run 3 emits nothing (offset log replay). Sink = appendOnce into
    // a second store table, so source-side exactly-once composes with
    // the sink-side txn fence. Graded output = everything the source
    // table ever held, which is what the stream must deliver
    // exactly once.
    "q244_table_stream_source" -> ((s, dir) => {
      val root = graft.sources.Scratch.processScoped("q244_snap", dir)
      Seq("src", "out", "_cp").foreach(d =>
        graft.sources.Scratch.deleteRecursively(new java.io.File(root, d)))
      val st = new graft.sources.SnapshotStore(s, root)
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_custkey").as("cust"), col("o_totalprice").as("p"))
      st.commit("src", o.where(col("k") % 3 === 0), overwrite = true,
        statsCols = Seq("k"))
      def drain(): Unit = {
        val q = s.readStream.format("graft-table")
          .option("root", root).option("view", "src").load()
          .writeStream
          .option("checkpointLocation", s"$root/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, id: Long) =>
            if (!batch.isEmpty)
              st.appendOnce("out", batch, txnId = id, statsCols = Seq("k"))
            ()
          }.start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      drain() // run 1: the initial snapshot
      val afterFirst = st.read("out").count()
      require(afterFirst == st.read("src").count(),
        "run 1 must emit exactly the initial snapshot")
      st.commit("src", o.where(col("k") % 3 === 1), overwrite = false,
        statsCols = Seq("k"))
      st.commit("src", o.where(col("k") % 3 === 2), overwrite = false,
        statsCols = Seq("k"))
      drain() // run 2: only the two appended commits
      val vAfter2 = st.versions("out").max
      drain() // run 3: nothing — the offset log already covers v3
      require(st.versions("out").max == vAfter2,
        "run 3 must move nothing (offset-log replay)")
      require(st.read("out").count() == o.count(),
        "runs 1+2 must deliver every row exactly once")
      st.read("out")
    }),

    // Table → table with ZERO user-side plumbing: the graft-table
    // format on BOTH ends — source offsets are commit versions, the
    // sink lands each micro-batch as one txn-fenced commit (txn id =
    // batch id salted by the checkpoint's namespace, so a second
    // writer query can't collide) — so the pipeline is exactly-once
    // end to end with no foreachBatch and no state outside the two
    // tables' manifests. Three runs on one checkpoint: snapshot, the
    // appended commit, nothing.
    "q262_table_to_table_stream" -> ((s, dir) => {
      val root = graft.sources.Scratch.processScoped("q262_snap", dir)
      Seq("src", "out", "_cp").foreach(d =>
        graft.sources.Scratch.deleteRecursively(new java.io.File(root, d)))
      val st = new graft.sources.SnapshotStore(s, root)
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_custkey").as("cust"), col("o_totalprice").as("p"))
      st.commit("src", o.where(col("k") % 2 === 0), overwrite = true,
        statsCols = Seq("k"))
      def drain(): Unit = {
        val q = s.readStream.format("graft-table")
          .option("root", root).option("view", "src").load()
          .withColumn("p2", col("p") * 2)
          .writeStream.format("graft-table")
          .option("root", root).option("view", "out")
          .option("statsColumns", "k")
          .option("checkpointLocation", s"$root/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      drain()
      st.commit("src", o.where(col("k") % 2 === 1), overwrite = false,
        statsCols = Seq("k"))
      drain()
      val vAfter = st.versions("out").max
      drain()
      require(st.versions("out").max == vAfter,
        "a drained pipeline must commit nothing (txn fence)")
      st.read("out")
    }),

    // CDC REPLICATION with zero user state: the change-feed SOURCE
    // (snapshot-diff per offset range) feeds the keyed SINK's
    // `deleteColumn` tombstone apply, so a replica table tracks a
    // source through the FULL SQL DML surface — the seed snapshot
    // lands as inserts, then one diff batch nets INSERT + UPDATE +
    // deletion-vector DELETE into upserts and keyed deletes, all
    // txn-fenced (third drain required to commit nothing). The oracle
    // replays the mutations declaratively against the replica.
    "q277_cdc_replication" -> ((s, dir) => {
      val root = graft.sources.Scratch.processScoped("q277_snap", dir)
      Seq("t277", "rep277", "_cp277").foreach(d =>
        graft.sources.Scratch.deleteRecursively(new java.io.File(root, d)))
      graft.plans.GraftTableRegistry.unregister("t277")
      t(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_custkey").as("cust"), col("o_totalprice").as("p"))
        .createOrReplaceTempView("q277_orders")
      s.sql(s"CREATE TABLE t277 USING graft PRIMARY KEY k LOCATION '$root' " +
        "AS SELECT k, cust, p FROM q277_orders WHERE k % 3 = 0")
      def drain(): Unit = {
        val q = s.readStream.format("graft-table")
          .option("root", root).option("view", "t277")
          .option("changeFeed", "true").option("keyColumns", "k").load()
          .select(col("k"), col("cust_post").as("cust"),
            col("p_post").as("p"),
            (col("change_type") === "delete").as("del"))
          .writeStream.format("graft-table")
          .option("root", root).option("view", "rep277")
          .option("mergeKey", "k").option("deleteColumn", "del")
          .option("statsColumns", "k")
          .option("checkpointLocation", s"$root/_cp277")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      drain() // the v1 snapshot replicates as pure inserts
      s.sql("INSERT INTO t277 SELECT k, cust, p FROM q277_orders WHERE k % 3 = 1")
      s.sql("UPDATE t277 SET p = p + 1000 WHERE cust % 5 = 0")
      s.sql("DELETE FROM t277 WHERE k % 9 = 0")
      drain() // one net diff batch applies all three mutations
      val st = graft.plans.GraftTableRegistry.lookup("t277").get._1
      val vRep = st.versions("rep277").max
      drain()
      require(st.versions("rep277").max == vRep,
        "a drained replication pipeline must commit nothing")
      st.read("rep277")
    }),

    // Stream THROUGH a compaction — the operational path q244 fences:
    // OPTIMIZE rewrites every data dir, so "new dirs since my offset"
    // stops meaning "appended rows" and the append-mode stream FAILS
    // (required below — silent re-emission is the bug). The recovery
    // that loses nothing is sink-shaped: a KEYED sink replays from
    // scratch and converges (mergeIntoOnce is idempotent per key and
    // txn-fenced per batch), so a fresh checkpoint from version 0
    // re-absorbs the compacted table plus everything after it. Append
    // sinks would opt into ignoreRewrites instead; q248 grades the
    // keyed-replay road. Run-2 txns live in a distinct id space — a
    // new checkpoint restarts batch ids at 0, and the fence must not
    // mistake them for run-1's.
    "q248_stream_compaction_replay" -> ((s, dir) => {
      val root = graft.sources.Scratch.processScoped("q248_snap", dir)
      Seq("src", "out", "_cp1", "_cp2").foreach(d =>
        graft.sources.Scratch.deleteRecursively(new java.io.File(root, d)))
      val st = new graft.sources.SnapshotStore(s, root)
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_custkey").as("cust"), col("o_totalprice").as("p"))
      st.commit("src", o.where(col("k") % 3 === 0), overwrite = true,
        statsCols = Seq("k"))
      def drain(cp: String, txnBase: Long): Unit = {
        val q = s.readStream.format("graft-table")
          .option("root", root).option("view", "src").load()
          .writeStream
          .option("checkpointLocation", s"$root/$cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, id: Long) =>
            if (!batch.isEmpty)
              st.mergeIntoOnce("out", batch, "k", txnId = txnBase + id,
                statsCols = Seq("k"))
            ()
          }.start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      drain("_cp1", 0L)
      st.commit("src", o.where(col("k") % 3 === 1), overwrite = false,
        statsCols = Seq("k"))
      st.compact("src") // rewrites every dir
      st.commit("src", o.where(col("k") % 3 === 2), overwrite = false,
        statsCols = Seq("k"))
      val failed =
        try { drain("_cp1", 0L); false }
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
      require(failed, "a compaction inside the offset range must fail the append stream")
      drain("_cp2", 1000L) // keyed replay from scratch: converges
      require(st.read("out").count() == o.count(),
        "keyed replay must converge to the table, no dup no loss")
      st.read("out")
    }),

    // Streaming GDPR deleter — the compliance loop composed from the
    // round's pieces: a stream of erasure requests (user ids) drives
    // foreachBatch(deleteWhereOnce) against the ACID table — each
    // micro-batch publishes ONE deletion vector keyed by the batch id
    // (zero data rewrite; a redelivered batch is fenced by the txn
    // history), and a RESTART on the same checkpoint moves nothing
    // (required in-query). Final table = every row of a non-erased
    // user, which is the oracle.
    "q243_stream_gdpr_delete" -> ((s, dir) => {
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val root = graft.sources.Scratch.processScoped("q243_gdpr", dir)
      graft.sources.Scratch.deleteRecursively(new java.io.File(root, "store"))
      graft.sources.Scratch.deleteRecursively(new java.io.File(root, "_cp"))
      val inRoot = graft.sources.Scratch.processScoped("q243_in", dir)
      val inDir = new java.io.File(s"$inRoot/in")
      if (!new java.io.File(inDir, "_staged").exists()) {
        inDir.mkdirs()
        val reqs = ev.select(col("user_id")).distinct()
          .where(pmod(col("user_id"), lit(13)) === 0)
        Seq(0, 1).foreach { m =>
          val tmp = s"$inRoot/tmp$m"
          reqs.where(pmod(col("user_id"), lit(2)) === m).coalesce(1)
            .write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = new java.io.File(inDir, s"b$m.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          dst.setLastModified(1700000000000L + m * 10000L)
          graft.sources.Scratch.deleteRecursively(new java.io.File(tmp))
        }
        new java.io.File(inDir, "_staged").createNewFile()
      }
      val st = new graft.sources.SnapshotStore(s, s"$root/store")
      st.commit("t", ev, overwrite = true, statsCols = Seq("event_id"))
      def runStream(): Unit = {
        val stream = s.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType))))
          .option("maxFilesPerTrigger", 1).parquet(s"$inDir")
        val q = stream.writeStream
          .option("checkpointLocation", s"$root/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val users = batch.select(col("user_id")).distinct()
              .collect().map(_.getLong(0)).toSeq
            if (users.nonEmpty)
              st.deleteWhereOnce("t", "event_id",
                col("user_id").isin(users: _*), txnId = id)
            ()
          }
          .start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      runStream()
      val v = st.versions("t").max
      runStream() // restart on the same checkpoint: fenced, nothing moves
      require(st.versions("t").max == v,
        "redelivered erasure batches must be fenced")
      require(st.manifestDels("t", v).nonEmpty, "vectors missing")
      st.read("t")
    }),

    // q82's enrichment upgraded from equi to AS-OF semantics: per
    // streamed error event, the latest purchase time at-or-before the
    // event — the point-in-time feature lookup a streaming scorer
    // needs — through the NATIVE AsOfJoinNode, planned per micro-batch
    // by the same strategy as the batch path (stream-static as-of is
    // exactly a per-batch backward lookup against the static side, so
    // batch-vs-stream must be row-identical: the oracle is q201's).
    "q230_stream_asof_enrich" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val purchases = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      val stream = graft.Tables.eventsStream(s, dir, Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("ts", LongType), StructField("event_type", StringType)))
        .where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val joined = graft.operators.AsOfJoin.lookupLastNative(stream,
        purchases, "user_id", "ts", "p_ts", "p_ts", "last_purchase_ts")
      graft.streaming.StreamJoin.runAvailableNow(s,
        joined.select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("last_purchase_ts").cast("timestamp_ntz").as("last_purchase_ts")))
    }),

    "q82_stream_static_join" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType)))
      val raw = s.readStream.schema(schema).parquet(s"$dir/events.parque*")
      val dim = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = raw.join(broadcast(dim), col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_mktsegment"), col("value"))
      graft.streaming.StreamJoin.runAvailableNow(s, joined)
    }),

    // K1 graded END-TO-END: the checkpointed foreachBatch ingest sink
    // (the reference's master writer) run to completion, then read
    // back. The checkpoint is content-keyed and PERSISTENT on purpose:
    // the first run ingests everything, every later run (bench rounds,
    // re-verifies) replays against the same checkpoint, finds no new
    // offsets, appends NOTHING — and the view still hash-matches the
    // source. That replay-convergence is T6's at-least-once +
    // idempotent-sink contract made visible to the oracle.
    "q83_stream_ingest_sink" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // process-scoped: two JVMs sharing one streaming checkpoint would
      // contend on the offset log; within this process the persistent
      // checkpoint still demonstrates replay-convergence across runs
      val root = graft.sources.Scratch.processScoped("q83_ingest", dir)
      val store = new graft.sources.ViewStore(s, root)
      val parsed = graft.Tables.eventsStream(s, dir, Seq(
          StructField("event_id", LongType), StructField("ts", LongType),
          StructField("event_type", StringType), StructField("value", DoubleType)))
        .select(col("event_id"), to_date(col("ts")).cast("string").as("d"),
          col("event_type"), col("value"))
      val q = graft.streaming.Ingest.startMasterAppend(parsed, store, "ev_master",
        keyCol = "d", checkpoint = s"$root/_cp", keyed = false,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      try q.awaitTermination() finally if (q.isActive) q.stop()
      store.read("ev_master")
        .select(col("event_id"), col("d").cast("string").as("d"),
          col("event_type"), col("value"))
    }),

    // Stream-stream LEFT OUTER interval join — the subtle half of the
    // streaming join matrix: matched rows emit immediately (the q71
    // inner part), but a null-padded row for an unmatched view may
    // only emit once the watermark proves no purchase can still
    // arrive, i.e. on state eviction. The oracle replays that rule —
    // unmatched rows appear iff view_ts < min(max view_ts, max buy_ts)
    // − delay − upper — so the hash match pins outer-join emission
    // semantics (1232 of 1295 batch-unmatched rows emit at sf0.01, the
    // tail is withheld as not-yet-provably-unmatched).
    "q84_stream_outer_join" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      def read() = graft.Tables.eventsStream(s, dir, Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType)))
      val views = read().where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("view_ts"))
      val buys = read().where(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id").as("b_user"),
          col("ts").as("buy_ts"))
      val joined = views.withWatermark("view_ts", "1 hour")
        .join(buys.withWatermark("buy_ts", "1 hour"),
          expr("v_user = b_user AND buy_ts >= view_ts AND " +
            "buy_ts <= view_ts + INTERVAL 24 hours"),
          "left_outer")
      graft.streaming.StreamJoin.runAvailableNow(s,
          joined.select(col("view_id"), col("buy_id"),
            unix_micros(col("view_ts")).as("view_us")),
          statePartitions = Some(8))
    }),

    // §3.3 serving forecast: ARX(2) one-step-ahead on the daily order
    // totals with exogenous order counts. Driver-side on O(days) rows by
    // design. Oracle: the DuckDB mirror rebuilds the identical
    // stable-rounded series, forms the same ridge normal equations, and
    // solves them by Cramer's rule (generated cofactor SQL). The series
    // is fed in units of 1e6 so the 4x4 system is well-conditioned:
    // Gaussian elimination (engine) and Cramer (oracle) then agree to
    // ~1e-12 relative, far inside the 4-decimal stable round.
    "q26_forecast" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg((NumFns.stableRound(sum(col("o_totalprice")), 2) / lit(1e6)).as("total_m"),
          count(lit(1)).cast("double").as("n_orders"))
        .where(col("d").between("1995-01-01", "1995-12-31"))
        .withColumn("d", date_format(col("d"), "yyyy-MM-dd"))
      ServingJob.run(s, daily, "d", "total_m", Seq("n_orders"),
          horizonDate = "1996-01-01", new ArxForecaster(p = 2))
        .select(col("d"),
          NumFns.stableRound(col("total_m_pred") * lit(1e6), 4).as("total_pred"))
    })
  )

  /** Laplace-expansion determinant SQL for a small matrix of SQL
    * expressions — emits the cofactor sum for Cramer's-rule oracles.
    */
  private def detSql(m: Vector[Vector[String]]): String =
    if (m.length == 1) m(0)(0)
    else (0 until m.length).map { j =>
      val minor = m.tail.map(row => row.zipWithIndex.collect { case (e, c) if c != j => e })
      val sign = if (j % 2 == 0) "+" else "-"
      s"$sign ${m(0)(j)} * (${detSql(minor)})"
    }.mkString(" ")

  /** Shared oracle of the two graded merge paths (q63 fMGWS, q85 TWS). */
  private val SpeedMergeSql: String =
    """WITH ev AS (
           SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) AS d,
                  event_id AS seq, event_type, value
           FROM events),
         ta AS (
           SELECT d,
             last(value + 1.0 ORDER BY seq) AS open,
             last(value + 2.0 ORDER BY seq) AS high,
             last(value - 1.0 ORDER BY seq) AS low,
             last(value ORDER BY seq) AS close,
             last(value ORDER BY seq) FILTER (WHERE value >= 100.0) AS adj_close,
             last(value * 10.0 ORDER BY seq) FILTER (WHERE value >= 50.0) AS volume
           FROM ev WHERE event_type = 'purchase' GROUP BY d),
         sa AS (
           SELECT d, COUNT(*) AS nbr_article,
             list_reduce(list(value / 200.0 ORDER BY seq), (x, y) -> (x + y) / 2.0) AS positive,
             list_reduce(list((200.0 - value) / 200.0 ORDER BY seq), (x, y) -> (x + y) / 2.0) AS negative,
             list_reduce(list(abs(100.0 - value) / 100.0 ORDER BY seq), (x, y) -> (x + y) / 2.0) AS neutral
           FROM ev WHERE event_type = 'click' GROUP BY d)
         SELECT COALESCE(ta.d, sa.d) AS date, open, high, low, close, adj_close,
           volume, COALESCE(nbr_article, 0) AS nbr_article,
           positive, negative, neutral
         FROM ta FULL JOIN sa ON ta.d = sa.d"""

  /** Shared WITH prefix replaying the batch recompute (date cycle, clean
    * gate len>=10, per-article sentiment with doc_id carried for
    * seq-ordered speed folds, daily agg, OHLCV stock agg). Ends with
    * `scored`, `agg`, `stock` in scope — used by the q25 (batch_view)
    * and q150 (lambda day-cycle splice) oracles.
    */
  private val LambdaBatchCte: String = {
    val pos = graft.functions.SentimentFns.DefaultPositive.map(w => s"'$w'").mkString("[", ", ", "]")
    val neg = graft.functions.SentimentFns.DefaultNegative.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH news AS (
          SELECT doc_id,
                 strftime(DATE '1997-01-01' + INTERVAL (doc_id % 30) DAY, '%Y-%m-%d') AS d,
                 ${SqlFragments.cleanExpr} AS clean
          FROM documents WHERE text IS NOT NULL AND LENGTH(text) >= 10),
        toks AS (
          SELECT doc_id, d, list_filter(regexp_split_to_array(lower(clean), '\\s+'), x -> length(x) > 0) AS tk
          FROM news WHERE clean IS NOT NULL),
        scored AS (
          SELECT doc_id, d, CAST(len(tk) AS DOUBLE) AS n,
                 CAST(len(list_filter(tk, x -> list_contains($pos, x))) AS DOUBLE) AS pc,
                 CAST(len(list_filter(tk, x -> list_contains($neg, x))) AS DOUBLE) AS nc
          FROM toks),
        agg AS (
          SELECT d, COUNT(*) AS nbr,
                 AVG((pc + 1.0) / (n + 3.0)) AS p,
                 AVG((nc + 1.0) / (n + 3.0)) AS ng,
                 AVG((n - pc - nc + 1.0) / (n + 3.0)) AS nu
          FROM scored GROUP BY d),
        stock AS (
          SELECT strftime(l_shipdate, '%Y-%m-%d') AS ds,
                 MIN(l_extendedprice) AS Low,
                 MAX(l_extendedprice) AS High,
                 ${SqlFragments.r15("SUM(l_extendedprice)", 4)} AS Open,
                 ${SqlFragments.r15("AVG(l_extendedprice)", 4)} AS Close,
                 SUM(l_quantity) AS Volume
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-01-30'
          GROUP BY 1)"""
  }

  val oracle: Map[String, String] = Map(
    "q25_batch_pipeline" ->
      s"""$LambdaBatchCte
          SELECT agg.d AS "Date", Open, High, Low, Close, Volume,
                 CAST(nbr AS BIGINT) AS Nbr_article,
                 ${SqlFragments.r15("p", 6)} AS Positive, ${SqlFragments.r15("ng", 6)} AS Negative, ${SqlFragments.r15("nu", 6)} AS Neutre
          FROM stock JOIN agg ON stock.ds = agg.d
          WHERE agg.d <> '1997-01-30'""",

    // Day-cycle splice on the ACID layer: batch_view rows (the q25
    // recompute) tagged 'batch' for the closed days, plus today's
    // speed row — per-article scores folded EW in doc_id (= seq)
    // order, today's OHLCV close last-write-wins — tagged 'speed'.
    "q150_lambda_snapshot" ->
      s"""$LambdaBatchCte,
          bv AS (SELECT agg.d AS date, Close AS close,
                 CAST(nbr AS BIGINT) AS nbr_article,
                 ${SqlFragments.r15("p", 6)} AS positive, 'batch' AS source
                 FROM stock JOIN agg ON stock.ds = agg.d
                 WHERE agg.d <> '1997-01-30'),
          spn AS (SELECT COUNT(*) AS nbr,
                  list_reduce(list((pc + 1.0) / (n + 3.0) ORDER BY doc_id),
                    (x, y) -> (x + y) / 2.0) AS pos
                  FROM scored WHERE d = '1997-01-30'),
          spt AS (SELECT Close FROM stock WHERE ds = '1997-01-30'),
          sp AS (SELECT '1997-01-30' AS date, spt.Close AS close,
                 CAST(spn.nbr AS BIGINT) AS nbr_article, spn.pos AS positive,
                 'speed' AS source
                 FROM spn LEFT JOIN spt ON TRUE)
          SELECT date, close, nbr_article, positive, source FROM bv
          UNION ALL
          SELECT date, close, nbr_article, positive, source FROM sp""",
    "q63_speed_merge" -> SpeedMergeSql,

    // The reservoir = the k smallest LCG priorities per key, a pure
    // set property the online sampler converges to.
    "q162_stream_reservoir" ->
      """WITH p AS (SELECT event_type, event_id,
           CAST((event_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             / 2147483648.0 AS u
           FROM events),
         r AS (SELECT event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u, event_id) AS rn
               FROM p)
         SELECT event_type, event_id FROM r WHERE rn <= 10""",

    "q85_speed_merge_tws" -> SpeedMergeSql,
    // T5: shuffled two-batch delivery converges to the in-order result
    "q95_speed_merge_late" -> SpeedMergeSql,
    // the streamed Holt fold must equal the batch recurrence exactly
    "q253_stream_holt" -> TimeSeriesQueries.HoltSql,

    "q71_stream_interval_join" ->
      """SELECT v.event_id AS view_id, p.event_id AS buy_id, v.user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP)) AS gap_us
         FROM events v JOIN events p
           ON v.user_id = p.user_id
          AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
          AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 24 HOUR
         WHERE v.event_type = 'view' AND p.event_type = 'purchase'""",

    "q74_stream_dedup" ->
      """SELECT event_id, user_id, event_type FROM events""",

    "q76_stream_windowed_agg" ->
      s"""WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
                     FROM events),
          mx AS (SELECT MAX(us) AS mus FROM e)
          SELECT us - (us % 21600000000) AS w_start_us, event_type,
            COUNT(*) AS n, ${SqlFragments.r15("SUM(value)", 4)} AS sum_value
          FROM e, mx
          GROUP BY us - (us % 21600000000), event_type, mus
          HAVING (us - (us % 21600000000)) + 21600000000 <= mus - 3600000000""",

    // Exact frequency threshold — the sketch's separation margin
    // makes the approximate admission identical to it.
    "q226_stream_hot_keys" ->
      """WITH k AS (SELECT CASE WHEN user_id % 10 < 6 THEN 0
                     ELSE user_id % 10 END AS k FROM events),
          tot AS (SELECT COUNT(*) AS t FROM k)
          SELECT CAST(k AS BIGINT) AS k FROM k, tot
          GROUP BY k, t HAVING COUNT(*) > 0.15 * t""",

    // Same q76 cutoff; exact distinct from the oracle, estimate gated.
    "q218_stream_distinct" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, user_id
                    FROM events),
          mx AS (SELECT MAX(us) AS mus FROM e)
          SELECT us - (us % 21600000000) AS w_us, COUNT(*) AS n,
            COUNT(DISTINCT user_id) AS n_exact, TRUE AS est_ok
          FROM e, mx
          GROUP BY us - (us % 21600000000), mus
          HAVING (us - (us % 21600000000)) + 21600000000 <= mus - 3600000000""",

    // Closed 6h windows only (same final-watermark cutoff as q76); the
    // shared SqlFragments.relQuantileWalk fragment replays per window.
    "q216_stream_quantiles" ->
      s"""WITH mx AS (
           SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS mus FROM events),
         ev AS (
           SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                  CAST(floor(value * 100) AS BIGINT) AS v
           FROM events WHERE floor(value * 100) >= 1),
         src AS (
           SELECT us - (us % 21600000000) AS k, v FROM ev, mx
           WHERE (us - (us % 21600000000)) + 21600000000 <= mus - 3600000000),
         ${SqlFragments.relQuantileWalk("src", "w_us")}""",

    "q83_stream_ingest_sink" ->
      """SELECT event_id,
           strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS d,
           event_type, value
         FROM events""",

    "q81_stream_update_agg" ->
      s"""SELECT event_type, COUNT(*) AS n,
          ${SqlFragments.r15("SUM(value)", 4)} AS sum_value
          FROM events GROUP BY event_type""",

    "q82_stream_static_join" ->
      """SELECT event_id, user_id, c_mktsegment, value
         FROM events JOIN customer ON user_id = c_custkey""",

    // the declarative pipeline delivers the projected table exactly once
    "q262_table_to_table_stream" ->
      """SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS p,
                o_totalprice * 2 AS p2
         FROM orders""",

    // the replica after netting insert + update + delete
    "q277_cdc_replication" ->
      """SELECT o_orderkey AS k, o_custkey AS cust,
            CASE WHEN o_custkey % 5 = 0 THEN o_totalprice + 1000
                 ELSE o_totalprice END AS p
         FROM orders
         WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 9 <> 0""",

    // replay-after-compaction converges to exactly the table
    "q248_stream_compaction_replay" ->
      """SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS p
         FROM orders""",

    // exactly-once across three runs = the table, no more, no less
    "q244_table_stream_source" ->
      """SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS p
         FROM orders""",

    // every row of a non-erased user survives, nothing else
    "q243_stream_gdpr_delete" ->
      """SELECT event_id, user_id, value FROM events
         WHERE user_id % 13 <> 0""",

    // the streamed as-of must be indistinguishable from q10/q201's truth
    "q230_stream_asof_enrich" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
         (SELECT max(CAST(p.ts AS TIMESTAMP)) FROM events p
          WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
            AND CAST(p.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)) AS last_purchase_ts
         FROM events e WHERE e.event_type = 'error'""",

    "q84_stream_outer_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS t
                    FROM events),
          v AS (SELECT event_id AS view_id, user_id, t AS vt FROM e
                WHERE event_type = 'view'),
          b AS (SELECT event_id AS buy_id, user_id, t AS bt FROM e
                WHERE event_type = 'purchase'),
          wm AS (SELECT LEAST((SELECT MAX(epoch_us(vt)) FROM v),
                              (SELECT MAX(epoch_us(bt)) FROM b))
                   - 3600000000 - 86400000000 AS cutoff)
          SELECT view_id, buy_id, epoch_us(vt) AS view_us
          FROM v LEFT JOIN b
            ON v.user_id = b.user_id AND bt >= vt AND bt <= vt + INTERVAL 24 HOUR,
            wm
          WHERE buy_id IS NOT NULL OR epoch_us(vt) < cutoff""",

    "q80_stream_join_agg" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
          v AS (SELECT user_id, t AS vt FROM e WHERE event_type = 'view'),
          b AS (SELECT user_id, t AS bt FROM e WHERE event_type = 'purchase'),
          j AS (SELECT epoch_us(vt) AS vus
                FROM v JOIN b ON v.user_id = b.user_id
                 AND bt >= vt AND bt <= vt + INTERVAL 24 HOUR),
          wm AS (SELECT LEAST((SELECT MAX(epoch_us(vt)) FROM v),
                              (SELECT MAX(epoch_us(bt)) FROM b))
                   - 3600000000 - 86400000000 AS cutoff)
          SELECT vus - (vus % 21600000000) AS w_start_us, COUNT(*) AS n_attributed
          FROM j, wm
          GROUP BY vus - (vus % 21600000000), cutoff
          HAVING (vus - (vus % 21600000000)) + 21600000000 <= cutoff""",

    "q77_stream_sessions" ->
      s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
          m AS (SELECT user_id, ts, value,
                CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 2 HOUR
                     THEN 1 ELSE 0 END AS brk
                FROM e),
          s AS (SELECT user_id, ts, value,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
                FROM m),
          mx AS (SELECT MAX(ts) AS mt FROM e)
          SELECT user_id, epoch_us(MIN(ts)) AS start_us, COUNT(*) AS n_events,
            ${SqlFragments.r15("SUM(value)", 4)} AS sum_value
          FROM s, mx
          GROUP BY user_id, sid, mt
          HAVING MAX(ts) + INTERVAL 2 HOUR <= mt - INTERVAL 1 HOUR""",

    "q26_forecast" -> {
      // ArxForecaster(p=2) + 1 exog mirror: features per training row t
      // are [1, y(t-1), y(t-2), x(t)] (ArxForecaster.predictNext), the
      // 4x4 ridge normal equations use ridge 1e-6 on the diagonal, and
      // the forecast row is [1, y(n-1), y(n-2), x(n-1)].
      val dim = 4
      val A = Vector.tabulate(dim, dim)((i, j) => s"g$i$j")
      val detA = detSql(A)
      val betas = (0 until dim).map { i =>
        val ai = Vector.tabulate(dim, dim)((r, c) => if (c == i) s"b$r" else s"g$r$c")
        s"((${detSql(ai)}) / ($detA)) AS beta$i"
      }.mkString(", ")
      val gSums = (for (i <- 0 until dim; j <- 0 until dim) yield {
        val ridge = if (i == j) " + 0.000001" else ""
        s"SUM(f$i * f$j)$ridge AS g$i$j"
      }).mkString(", ")
      val bSums = (0 until dim).map(i => s"SUM(f$i * yt) AS b$i").mkString(", ")
      s"""WITH daily AS (
            SELECT o_orderdate AS d,
                   ${SqlFragments.r15("SUM(o_totalprice)", 2)} / 1000000.0 AS y,
                   CAST(COUNT(*) AS DOUBLE) AS x
            FROM orders
            WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
            GROUP BY o_orderdate),
          s AS (SELECT y, x, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily),
          feat AS (SELECT c.y AS yt, 1.0 AS f0, b.y AS f1, a.y AS f2, c.x AS f3
                   FROM s c JOIN s b ON b.t = c.t - 1 JOIN s a ON a.t = c.t - 2),
          g AS (SELECT $gSums, $bSums FROM feat),
          beta AS (SELECT $betas FROM g),
          xn AS (SELECT 1.0 AS x0,
                   (SELECT y FROM s WHERE t = (SELECT MAX(t) FROM s)) AS x1,
                   (SELECT y FROM s WHERE t = (SELECT MAX(t) FROM s) - 1) AS x2,
                   (SELECT x FROM s WHERE t = (SELECT MAX(t) FROM s)) AS x3)
          SELECT '1996-01-01' AS d,
            ${SqlFragments.r15("(beta0 * x0 + beta1 * x1 + beta2 * x2 + beta3 * x3) * 1000000.0", 4)} AS total_pred
          FROM beta, xn"""
    }
  )
}
