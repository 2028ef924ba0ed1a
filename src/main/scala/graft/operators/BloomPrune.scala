package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter semi-join pruning — the shuffle-reduction
  * pattern for `big fact ⋈ selective dim` where the dim key set is too
  * large to broadcast as a hash relation but its BLOOM FILTER is tiny:
  * build one merged filter over the dim keys (partial-combined
  * aggregate, O(numBits) per task), ship it to the driver, and apply
  * `might_contain` as a literal predicate on the fact side BEFORE the
  * join shuffle. No false negatives, so the subsequent exact join is
  * unchanged — only the shuffled volume shrinks by (1 - selectivity -
  * fpp).
  *
  * This is the manual form of Spark's InjectRuntimeFilter (which plants
  * the same BloomFilterAggregate/BloomFilterMightContain pair as a
  * scalar subquery when statistics justify it): explicit, so a pipeline
  * can prune at a boundary the optimizer can't see across — e.g.
  * filtering a raw scan by the key set of an already-curated table
  * before any join is even phrased. The driver-side collect is the
  * sketch itself — O(numBits), the same materialization path the
  * built-in runtime filter uses (subquery result -> driver -> literal)
  * — never row data.
  *
  * `might_contain` requires its filter side to be a literal or scalar
  * subquery (analysis-enforced), hence the eager build: calling this
  * runs the dim-side aggregate immediately.
  */
object BloomPrune {

  /** Build the merged bloom filter of `dim`'s `dimKey` values. */
  def buildFilter(dim: DataFrame, dimKey: String,
                  expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expressionEager(xxhash64(col(dimKey))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    dim.agg(agg.as("_bf")).collect()(0).getAs[Array[Byte]](0)
  }

  /** `might_contain(filter, xxhash64(key))` as a Column predicate. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      ColumnBridge.expressionEager(xxhash64(key))))

  /** Prune `fact` down to rows whose `factKey` might appear in `dim`'s
    * `dimKey` set. Superset of the true semi-join (bloom filters have
    * no false negatives); follow with the exact join.
    */
  def semiPrune(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                expectedItems: Long = 1000000L,
                numBits: Long = 8388608L): DataFrame = {
    val bf = buildFilter(dim, dimKey, expectedItems, numBits)
    fact.where(mightContain(bf, col(factKey)))
  }
}
