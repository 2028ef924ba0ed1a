package graft.streaming

import graft.sources.ViewStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest: the batch layer's master writers (reference:
  * Batch_layer/yfConsumer.py, twitterConsumer.py — Kafka -> parse -> ES
  * append every 30 s with checkpoint). The Kafka scan is one
  * implementation behind `StreamSource`-shaped helpers; offline tests
  * drive MemoryStream/file sources through the same parse + sink path.
  */
object Ingest {

  /** K1: checkpointed streaming append into a master view. For the keyed
    * master (stock, id=Date at yfConsumer.py:60) the foreachBatch merge
    * gives idempotent-by-key delivery; the id-less news master appends
    * raw (twitterConsumer.py:54-66 has no mapping.id).
    */
  def startMasterAppend(parsed: DataFrame, store: ViewStore, view: String,
                        keyCol: String, checkpoint: String, keyed: Boolean,
                        trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
                        orderCol: Option[String] = None): StreamingQuery =
    parsed.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (keyed) {
          // one row per key per micro-batch, then partition-replace =>
          // replays converge (T6). With an orderCol (e.g. the Kafka
          // offset) the max-ordered row wins deterministically; without
          // one, the winner within a batch is arbitrary (groupBy order
          // after the shuffle is not arrival order).
          val payload = struct(batch.columns.filter(_ != keyCol).map(col): _*)
          val picked = orderCol match {
            case Some(oc) => max_by(payload, col(oc))
            case None => last(payload)
          }
          val latest = batch.groupBy(col(keyCol))
            .agg(picked.as("_s"))
            .select(col(keyCol) +: batch.columns.filter(_ != keyCol)
              .map(c => col("_s").getField(c).as(c)): _*)
          store.merge(view, latest, keyCol)
        } else {
          store.append(view, batch, keyCol)
        }
      }
      .start()

  /** K5: console debug sink (reference nytConsumer.py:64-69 — append
    * mode, periodic trigger).
    */
  def startConsoleDebug(parsed: DataFrame,
                        trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    parsed.writeStream.format("console").outputMode("append")
      .trigger(trigger).start()

  /** The speed-layer writer: stateful-merged SpeedRows -> keyed merge
    * into speed_view (replaces the two ES upsert scripts, K2).
    */
  def startSpeedView(merged: DataFrame, store: ViewStore, view: String,
                     checkpoint: String,
                     trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    merged.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // batch holds the latest state per touched date (one row emitted
        // per key per micro-batch) => dynamic partition replace is an
        // idempotent upsert
        store.merge(view, batch, "date")
      }
      .start()
}
