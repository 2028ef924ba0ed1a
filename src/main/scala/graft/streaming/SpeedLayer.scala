package graft.streaming

import graft.functions.EwAverage
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** The speed layer: both ingest streams parse JSON values and merge into
  * one per-day row keyed by Date (reference: Speed_layer/
  * yfConsumerStream.py + twitterConsumerStream.py upserting disjoint
  * field sets of the same ES doc via painless scripts). Here the merge is
  * internalized as Spark state (SURVEY §2.9 T7): the streams normalize to
  * SpeedDelta and fold in flatMapGroupsWithState, so checkpoint recovery
  * replays into the same state instead of re-hitting a store.
  *
  * State is one SpeedRow per calendar day — O(active days) keys, bounded;
  * at scale the state store shards by the Date key across executors
  * (RocksDB provider for large key counts).
  */
object SpeedLayer {

  /** stock_schema (reference yfConsumerStream.py:36-44): all strings on
    * the wire, "Adj Close" with the embedded space.
    */
  val stockSchema: StructType = StructType(Seq(
    StructField("Date", StringType), StructField("Open", StringType),
    StructField("High", StringType), StructField("Low", StringType),
    StructField("Close", StringType), StructField("Adj Close", StringType),
    StructField("Volume", StringType)))

  /** tweet_schema (reference twitterConsumerStream.py:43-46). */
  val newsSchema: StructType = StructType(Seq(
    StructField("Date", StringType), StructField("Text", StringType)))

  /** P1-P3: cast Kafka-like binary/string value, parse JSON with explicit
    * schema, expand the struct. PERMISSIVE: malformed JSON -> null struct
    * -> dropped (reference from_json semantics, SURVEY §1.3).
    */
  def parseStock(values: DataFrame): DataFrame =
    values.selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), stockSchema).as("data"))
      .select(col("data.*"))
      .na.drop(Seq("Date"))

  def parseNews(values: DataFrame): DataFrame =
    values.selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), newsSchema).as("data"))
      .select(col("data.*"))
      .na.drop(Seq("Date", "Text"))

  /** news_schema for the article stream (reference nytConsumer.py:36-40:
    * Id, Date, lowercase-t text).
    */
  val articleSchema: StructType = StructType(Seq(
    StructField("Id", StringType), StructField("Date", StringType),
    StructField("text", StringType)))

  /** F4: article stream parse + dedup by Id — the engine-side version
    * of the producer's last-id dedup (nytProducer.py:47-49). NOTE: plain
    * dropDuplicates on a stream keeps per-Id state FOREVER (no watermark
    * can bound a non-event-time key); fine for bounded replays/tests,
    * use parseArticlesBounded for long-running ingest.
    */
  def parseArticles(values: DataFrame): DataFrame =
    values.selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), articleSchema).as("data"))
      .select(col("data.*"))
      .na.drop(Seq("Id"))
      .dropDuplicates("Id")

  /** Bounded-state variant: event time derived from Date, state evicted
    * past the watermark via dropDuplicatesWithinWatermark — duplicates
    * separated by more than the delay can re-emit, the standard
    * state-size/exactness trade at scale.
    */
  def parseArticlesBounded(values: DataFrame, delay: String = "7 days"): DataFrame =
    values.selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), articleSchema).as("data"))
      .select(col("data.*"))
      .na.drop(Seq("Id"))
      .withColumn("_evt", to_timestamp(col("Date")))
      .withWatermark("_evt", delay)
      .dropDuplicatesWithinWatermark("Id")
      .drop("_evt")

  /** Normalize a parsed stock stream to SpeedDelta. */
  def stockDeltas(parsed: DataFrame)(implicit spark: SparkSession): Dataset[SpeedDelta] = {
    import spark.implicits._
    parsed.select(col("Date"), col("Open"), col("High"), col("Low"),
        col("Close"), col("`Adj Close`").as("AdjClose"), col("Volume"))
      .as[(String, Option[String], Option[String], Option[String], Option[String], Option[String], Option[String])]
      .map { case (d, o, h, l, c, a, v) =>
        def num(s: Option[String]) = s.flatMap(x => scala.util.Try(x.toDouble).toOption)
        SpeedDelta(d, 0L, Some(Tick(d, num(o), num(h), num(l), num(c), num(a), num(v))), None)
      }
  }

  /** Normalize a parsed+scored news stream to SpeedDelta. `seq` preserves
    * arrival order for the order-dependent EW fold.
    */
  def newsDeltas(scored: DataFrame)(implicit spark: SparkSession): Dataset[SpeedDelta] = {
    import spark.implicits._
    scored.select(col("Date"), col("seq"), col("Positive"), col("Negative"), col("Neutre"))
      .as[(String, Long, Double, Double, Double)]
      .map { case (d, seq, p, n, u) => SpeedDelta(d, seq, None, Some(SentimentScore(p, n, u))) }
  }

  /** The J2/A3 keyed merge: OHLCV fields last-write-wins, sentiment
    * fields fold x' = (x+v)/2 in seq order, Nbr_article increments —
    * exactly the reference's two painless scripts
    * (yfConsumerStream.py:57-67, twitterConsumerStream.py:94-107), but as
    * Spark state. Emits the updated row per key per micro-batch.
    */
  def mergeDeltas(deltas: Dataset[SpeedDelta],
                  retention: Option[java.time.Duration] = None): Dataset[SpeedRow] = {
    import deltas.sparkSession.implicits._
    val timeoutConf =
      if (retention.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    deltas.groupByKey(_.date)
      .flatMapGroupsWithState[SpeedRow, SpeedRow](
        OutputMode.Append, timeoutConf)(mergeHandler(retention))
  }

  /** The per-key merge handler, named so the eviction branch is unit-
    * testable with `TestGroupState` (StateCapacitySpec): bounded state
    * (SURVEY T5) — day keys whose retention elapsed without new arrivals
    * are evicted, so state stays O(active days), not O(all days ever
    * seen).
    */
  private[streaming] def mergeHandler(retention: Option[java.time.Duration])(
      date: String, rows: Iterator[SpeedDelta],
      state: GroupState[SpeedRow]): Iterator[SpeedRow] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val cur = foldInto(
        state.getOption.getOrElse(emptyRow(date)), rows)
      state.update(cur)
      retention.foreach(r => state.setTimeoutDuration(r.toMillis))
      Iterator.single(cur)
    }

  private[streaming] def emptyRow(date: String): SpeedRow =
    SpeedRow(date, None, None, None, None, None, None, 0L, None, None, None)

  /** The merge fold shared by both state APIs: OHLCV last-write-wins,
    * sentiment EW (x+v)/2 in seq order, Nbr_article increments.
    */
  private[streaming] def foldInto(start: SpeedRow,
                                  rows: Iterator[SpeedDelta]): SpeedRow = {
    var cur = start
    rows.toSeq.sortBy(_.seq).foreach { d =>
      d.tick.foreach { t =>
        cur = cur.copy(
          open = t.open.orElse(cur.open), high = t.high.orElse(cur.high),
          low = t.low.orElse(cur.low), close = t.close.orElse(cur.close),
          adjClose = t.adjClose.orElse(cur.adjClose),
          volume = t.volume.orElse(cur.volume))
      }
      d.sentiment.foreach { sc =>
        cur = cur.copy(
          nbrArticle = cur.nbrArticle + 1,
          positive = Some(EwAverage.step(cur.positive, sc.pos)),
          negative = Some(EwAverage.step(cur.negative, sc.neg)),
          neutral = Some(EwAverage.step(cur.neutral, sc.neu)))
      }
    }
    cur
  }

  /** The same keyed merge on Spark 4's arbitrary-state API
    * (`transformWithState` + `StatefulProcessor`): typed ValueState per
    * day with native state TTL replacing the timeout bookkeeping.
    * Requires the RocksDB state store provider when run as a stream —
    * the provider the O(active days)-keys state shape wants at scale
    * anyway.
    */
  def mergeDeltasTws(deltas: Dataset[SpeedDelta],
                     retention: Option[java.time.Duration] = None): Dataset[SpeedRow] = {
    import deltas.sparkSession.implicits._
    // state TTL is clocked by processing time, so a retention requires
    // TimeMode.ProcessingTime (TTLConfig under TimeMode.None throws)
    val timeMode =
      if (retention.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    deltas.groupByKey(_.date)
      .transformWithState(new MergeDeltaProcessor(retention), timeMode, OutputMode.Append)
  }
}

/** StatefulProcessor form of the SpeedLayer merge (T7 on the modern
  * API): one `ValueState[SpeedRow]` per day key, TTL-evicted.
  */
class MergeDeltaProcessor(retention: Option[java.time.Duration])
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, SpeedDelta, SpeedRow] {

  @transient private var row: org.apache.spark.sql.streaming.ValueState[SpeedRow] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    val ttl = retention.map(org.apache.spark.sql.streaming.TTLConfig.apply)
      .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE)
    row = getHandle.getValueState[SpeedRow]("row",
      org.apache.spark.sql.Encoders.product[SpeedRow], ttl)
  }

  override def handleInputRows(date: String, rows: Iterator[SpeedDelta],
                               timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[SpeedRow] = {
    val start = if (row.exists()) row.get() else SpeedLayer.emptyRow(date)
    val cur = SpeedLayer.foldInto(start, rows)
    row.update(cur)
    Iterator.single(cur)
  }
}
