package graft.operators

import org.apache.spark.sql.DataFrame

/** CPU-width guard for compute-dense kernels fed by byte-sized scans.
  *
  * Scan parallelism is sized by BYTES (`spark.sql.files.maxPartitionBytes`),
  * so an input small in bytes but expensive per row (tokenize → shingle →
  * MinHash chains, edit-distance DPs, Viterbi segmentation) plans a handful
  * of tasks and serializes the kernel on one core while the rest of the
  * session idles — the guide §2.6 idle-capacity case. [[cpuWide]] spreads
  * such an input to the session's parallelism first; the shuffled bytes are
  * by definition small (that is why the scan was narrow), and the kernel
  * then uses every core.
  *
  * The decision is made from the optimizer's plan-stats size estimate
  * ONLY — never by probing the physical plan (`df.rdd` under AQE
  * materializes every non-final query stage eagerly, which would execute
  * join subtrees once for the probe and again for the real query):
  *
  *  - below `minBytes` (64 KB): micro-batch-sized frames — the exchange
  *    would cost more than the kernel; pass through.
  *  - above `maxBytes` (4 GB ≈ 32 × 128 MB scan splits): the input already
  *    scans at least as wide as a session, and a forced full shuffle of a
  *    table at real scale is exactly what this guard must never add; pass
  *    through. Frames with UNKNOWN stats (defaultSizeInBytes = Long.Max,
  *    e.g. localCheckpointed micro-batches) land here and pass through.
  *
  * Results are unchanged by construction: round-robin repartition is
  * deterministic under Spark's sort-before-repartition, and every caller
  * is partitioning-insensitive (no spark_partition_id /
  * monotonically_increasing_id / input_file_name in the fed kernels;
  * order-sensitive aggregates in them are sort_array-pinned).
  */
object Spread {

  def cpuWide(df: DataFrame, minBytes: Long = 64L << 10,
              maxBytes: Long = 4L << 30): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong
    if (est < minBytes || est > maxBytes) df
    else df.repartition(df.sparkSession.sparkContext.defaultParallelism)
  }
}
