package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom semi-join pruning: no false negatives (every true match
  * survives), effective pruning (false-positive survivors rare), and
  * the composed prune+join equals the plain semi-join. Deterministic:
  * the filter hashes with seedless xxhash64.
  */
class BloomPruneSpec extends SparkSpec {

  private lazy val li = graft.Tables.load(spark, sf(), "lineitem")
    .select(col("l_orderkey"))
  private lazy val hot = graft.Tables.load(spark, sf(), "orders")
    .where(col("o_totalprice") > 450000).select(col("o_orderkey"))

  test("pruned set is a superset of the true matches and a small fraction of the fact") {
    val pruned = BloomPrune.semiPrune(li, hot, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, numBits = 1L << 17)
    val total = li.count()
    val prunedN = pruned.count()
    val trueN = li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val missed = li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .exceptAll(pruned).count()
    assert(missed == 0, "bloom filter produced a false negative")
    assert(prunedN >= trueN)
    // effectiveness: survivors should be close to the true matches, far
    // below the unpruned fact (fpp at these sizes is well under 1%)
    assert(prunedN <= trueN + math.max(10L, total / 100),
      s"pruning ineffective: $prunedN survivors vs $trueN true of $total")
  }

  test("prune + exact join equals the plain semi-join row-for-row") {
    val viaBloom = BloomPrune.semiPrune(li, hot, "l_orderkey", "o_orderkey",
        expectedItems = 10000L, numBits = 1L << 17)
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val plain = li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(viaBloom.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(viaBloom).count() == 0)
  }

  test("might_contain appears as a literal predicate in the fact scan stage") {
    val pruned = BloomPrune.semiPrune(li, hot, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, numBits = 1L << 17)
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p)
    // the filter sits on the scan side — no join/shuffle introduced to apply it
    assert(!p.contains("Exchange"), p)
  }
}
