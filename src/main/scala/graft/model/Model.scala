package graft.model

/** Typed core of the lambda pipeline (SURVEY.md §1.4). Dates stay
  * "yyyy-MM-dd" strings at the boundary for reference fidelity
  * (es.mapping.date.rich=false semantics — SURVEY §1.2); internal ops may
  * convert to DateType.
  */

/** One OHLCV tick (reference stock_schema, yfConsumer.py:36-44 — all
  * string-typed on the wire; adjClose often absent => null).
  */
case class Tick(
    date: String,
    open: Option[Double], high: Option[Double], low: Option[Double],
    close: Option[Double], adjClose: Option[Double], volume: Option[Double])

/** One news/tweet document (reference tweet_schema, twitterConsumer.py:42-45). */
case class NewsDoc(date: String, text: String)

/** Per-document sentiment scores: pos/neg/neu in [0,1], sum 1 (the
  * FinBERT output contract, batchPipeline.py:80-82).
  */
case class SentimentScore(pos: Double, neg: Double, neu: Double)

/** One day of joined features — the batch_view row
  * (batchPipeline.py:163-167).
  */
case class DailyFeatures(
    date: String,
    open: Double, high: Double, low: Double, close: Double, volume: Double,
    nbrArticle: Long, positive: Double, negative: Double, neutral: Double)

/** Speed-view state: the per-day document both streams upsert into
  * (reference: disjoint field sets of the same ES doc, keyed by Date —
  * yfConsumerStream.py ∩ twitterConsumerStream.py). Sentiment fields fold
  * with the EW (x+v)/2 rule; OHLCV fields last-write-win.
  */
case class SpeedRow(
    date: String,
    open: Option[Double], high: Option[Double], low: Option[Double],
    close: Option[Double], adjClose: Option[Double], volume: Option[Double],
    nbrArticle: Long,
    positive: Option[Double], negative: Option[Double], neutral: Option[Double])

/** Union delta type both speed streams normalize into before the keyed
  * merge (SURVEY §7.4): exactly one of `tick` / `sent` is set.
  */
case class SpeedDelta(
    date: String,
    seq: Long, // arrival order within the micro-batch, for the EW fold
    tick: Option[Tick],
    sentiment: Option[SentimentScore])
