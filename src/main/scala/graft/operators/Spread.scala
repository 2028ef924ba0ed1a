package graft.operators

import org.apache.spark.sql.DataFrame

/** CPU-width guard for compute-dense kernels fed by byte-sized scans.
  *
  * Scan parallelism is sized by BYTES (`spark.sql.files.maxPartitionBytes`),
  * so an input small in bytes but expensive per row (tokenize → shingle →
  * MinHash chains, edit-distance DPs) plans a handful of tasks and
  * serializes the kernel on a few cores while the rest of the session
  * idles — the guide §2.6 idle-capacity case. [[cpuWide]] spreads such an
  * input to the session's parallelism first; the shuffled bytes are by
  * definition small (that is why the scan was narrow), and the kernel then
  * uses every core.
  *
  * Scale behavior: an input at real scale already scans wider than the
  * core count and passes through untouched, so this is a no-op exactly
  * where a forced repartition would hurt. The `minBytes` floor (plan-stats
  * estimate, zero jobs) keeps micro-batch-sized frames out — for a
  * 100-row batch the exchange would cost more than the kernel.
  *
  * Results are unchanged by construction: round-robin repartition is
  * deterministic under Spark's sort-before-repartition, and every caller
  * is partitioning-insensitive (no spark_partition_id /
  * monotonically_increasing_id / input_file_name in the fed kernels).
  */
object Spread {

  def cpuWide(df: DataFrame, minBytes: Long = 64L << 10): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val par = sc.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df
    else {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong
      if (est < minBytes) df else df.repartition(par)
    }
  }
}
