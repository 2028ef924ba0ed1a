package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference speed-layer's running "average": on each arrival the
  * stored value is folded as x' = (x + v) / 2 (reference:
  * airflow/dags/Speed_layer/twitterConsumerStream.py:94-107 — a painless
  * script executed inside Elasticsearch). That is an exponentially-
  * weighted mean, deliberately different from the batch layer's
  * arithmetic avg (batchPipeline.py:87-91); the engine keeps both, and
  * tests pin each.
  *
  * Order-dependent by construction, so the column form folds an
  * explicitly ordered array.
  */
object EwAverage {

  /** Fold an already-ordered array&lt;double&gt; column: seed = first
    * element, then acc' = (acc + v) / 2 for each subsequent element.
    * Null/empty arrays yield null.
    */
  def ewFold(ordered: Column): Column = {
    val rest = slice(ordered, lit(2), greatest(size(ordered) - lit(1), lit(0)))
    when(size(ordered) < 1, lit(null).cast("double"))
      .otherwise(aggregate(rest, element_at(ordered, 1).cast("double"),
        (acc, v) => (acc + v) / lit(2.0)))
  }

  /** Typed Aggregator form for the streaming path: merges a keyed group's
    * time-ordered (seq, value) pairs. Buffers the group's values so the
    * fold happens in order even though Spark feeds rows in partition
    * order; intended for per-key daily groups (O(10^3) values), not
    * unbounded groups.
    */
  class EwAgg extends Aggregator[(Long, Double), List[(Long, Double)], Double] {
    def zero: List[(Long, Double)] = Nil
    def reduce(b: List[(Long, Double)], a: (Long, Double)): List[(Long, Double)] = a :: b
    def merge(b1: List[(Long, Double)], b2: List[(Long, Double)]): List[(Long, Double)] = b1 ++ b2
    def finish(b: List[(Long, Double)]): Double = {
      val vs = b.sortBy(_._1).map(_._2)
      if (vs.isEmpty) Double.NaN else vs.tail.foldLeft(vs.head)((acc, v) => (acc + v) / 2.0)
    }
    def bufferEncoder: Encoder[List[(Long, Double)]] = Encoders.kryo[List[(Long, Double)]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Streaming-state fold step, exposed for mapGroupsWithState use. */
  def step(state: Option[Double], v: Double): Double = state match {
    case None    => v
    case Some(x) => (x + v) / 2.0
  }
}
