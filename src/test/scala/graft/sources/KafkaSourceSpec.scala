package graft.sources

import graft.SparkSpec

/** Keeps the Kafka reader path from bit-rotting in the offline image:
  * the connector jar is absent here, so `load()` must walk the full
  * reader-construction path (format + options) and fail ONLY at data
  * source resolution — any earlier failure (bad option wiring, API
  * drift) surfaces as a different error. Where the jar exists, the same
  * call simply succeeds with the Kafka schema.
  */
class KafkaSourceSpec extends SparkSpec {

  test("reader options carry the reference consumer config") {
    val src = new KafkaStreamSource("broker:9092", "stock_ticks")
    assert(src.options == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "stock_ticks",
      "failOnDataLoss" -> "false"))
  }

  test("load() reaches data-source resolution (jar boundary) cleanly") {
    val src = new KafkaStreamSource("broker:9092", "stock_ticks")
    try {
      val df = src.load(spark)
      // connector present: Kafka's fixed schema must expose value
      assert(df.columns.contains("value"))
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse("")
        assert(msg.toLowerCase.contains("kafka"),
          s"expected missing-kafka-source resolution error, got: $e")
    }
  }
}
