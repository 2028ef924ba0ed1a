package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** The 100-TB plan lint, swept over EVERY graded query: no plan in the
  * registry may contain a CartesianProduct or an unbounded
  * single-partition Exchange. PlanShapeSpec pins individual queries'
  * best plans; this spec is the closed invariant that a future query
  * can't silently violate.
  *
  * A SinglePartition exchange is structurally ALLOWED when its parent
  * proves the moved data is bounded regardless of input size:
  *   - a global aggregate's final stage (grouping keys empty — the
  *     exchange moves one partial row per map partition, O(partitions));
  *   - GlobalLimit / CollectLimit / TakeOrderedAndProject (at most the
  *     limit per upstream partition).
  * Anything else funnels an input-proportional frame through one
  * reducer and fails the lint, unless the query is in the explicit
  * allowlist below with a documented boundedness argument.
  *
  * The lint walks `queryExecution.sparkPlan` (pre-AQE): AQE only
  * re-plans exchanges downward (coalescing, local reads), so a clean
  * static plan stays clean at runtime, and the static form keeps the
  * walk deterministic.
  */
class PlanLintSpec extends SparkSpec {

  /** queryName -> why its single-partition exchange is bounded.
    * Keep this list SHORT (the lint's value is that it's exceptional)
    * and every entry justified by an O(bounded) frame, never by "it's
    * small at this sf".
    */
  private val singlePartitionAllowed: Map[String, String] = Map.empty

  private def lint(name: String, root: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def boundedParent(p: SparkPlan): Boolean = p match {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _: GlobalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec => true
      case _ => false
    }
    def walk(p: SparkPlan, parent: Option[SparkPlan]): Unit = {
      p match {
        case _: CartesianProductExec =>
          out += s"$name: CartesianProduct"
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
          if (!parent.exists(boundedParent) &&
              !singlePartitionAllowed.contains(name))
            out += s"$name: SinglePartition Exchange under " +
              parent.map(_.nodeName).getOrElse("(root)")
        case _ => ()
      }
      p.children.foreach(walk(_, Some(p)))
      p.subqueries.foreach(walk(_, Some(p)))
    }
    walk(root, None)
    out.toSeq
  }

  test("every graded query plan: no CartesianProduct, no unbounded single-partition Exchange") {
    val dir = sf()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try lint(name, fn(spark, dir).queryExecution.sparkPlan)
        catch { case e: Throwable =>
          Seq(s"$name: failed to build plan: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.length} plan-lint failures:\n" + failures.mkString("\n"))
  }

  test("the allowlist stays exceptional and current") {
    assert(singlePartitionAllowed.size <= 5, singlePartitionAllowed.keys)
    val unknown = singlePartitionAllowed.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"allowlisted but not in registry: $unknown")
  }
}
