package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the 100 TB design rule:
  * a handful of dominant keys must not serialize a stage). AQE's skew
  * join handles sort-merge cases at runtime — PlanShapeSpec ("AQE
  * splits a skewed sort-merge join") pins `OptimizeSkewedJoin`
  * splitting a synthetic hot key, so for a plain shuffled equi-join
  * prefer AQE over manual salting. These explicit forms cover what AQE
  * can't re-plan: skewed AGGREGATIONS (`saltedSumCount` — skew-join
  * splitting doesn't apply to a hash aggregate's partitioning) and
  * joins whose partitioning must stay deterministic across stages
  * (bucketed/co-partitioned layouts, where a runtime split would break
  * the co-location the layout exists to provide).
  */
object Skew {

  /** Two-phase salted aggregation: count per (key, salt) partial, then
    * merge partials per key. Turns one hot key into `salts` parallel
    * partials. Works for any algebraic aggregate expressed as
    * (partial, merge) column pairs — here sum/count, the common case.
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valCol: String,
                     salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("cnt"))

  /** Salted broadcast-side-replicated join for a skewed fact side
    * against a small-but-not-tiny dim that can't broadcast: replicate
    * each dim row `salts` times, salt the fact rows, join on
    * (key, salt). Spreads each hot key over `salts` reducers.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Keys holding more than `minFrac` of the fact rows — the salt
    * candidates. One map-side-combined agg over the key column; the
    * result is BOUNDED by construction (at most 1/minFrac keys can
    * each exceed a minFrac share), so collecting it to the driver is
    * O(1/minFrac), never O(distinct keys). At extreme cardinality
    * substitute a sketch (CmsEstimate) for the exact agg — the
    * two-path join below doesn't care how the set was found, only
    * that it's small.
    */
  def hotKeys(fact: DataFrame, key: String, minFrac: Double): Seq[Any] = {
    require(minFrac > 0.0 && minFrac <= 1.0)
    val total = fact.count()
    fact.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .where(col("_n") > lit(minFrac * total))
      .select(col(key))
      .collect().map(_.get(0)).toSeq.sortBy(String.valueOf(_))
  }

  /** Hot-key-only salted join: [[saltedJoin]] taxes EVERY key with a
    * `salts`× dim replication — at large dim scale that replication IS
    * the dominant shuffle. Here only the detected hot keys (above
    * `minFrac` of the fact) take the salted path, with just their dim
    * rows replicated; the cold remainder joins untouched. The hot set
    * is a bounded literal (≤ 1/minFrac keys), so both branch
    * predicates are codegen'd IN-lists, and the union is of two
    * independently-planned joins — AQE still broadcasts the cold dim
    * side if it's small. Output rows are identical to a plain join
    * (spec-pinned, and q191 grades it against the plain-join oracle).
    */
  def saltedJoinHot(fact: DataFrame, dim: DataFrame, key: String,
                    minFrac: Double = 0.05, salts: Int = 16): DataFrame = {
    val hot = hotKeys(fact, key, minFrac)
    if (hot.isEmpty) fact.join(dim, Seq(key))
    else {
      val isHot = col(key).isin(hot: _*)
      val salted = saltedJoin(fact.where(isHot), dim.where(isHot), key, salts)
      val cold = fact.where(!isHot).join(dim.where(!isHot), Seq(key))
      salted.unionByName(cold)
    }
  }
}
