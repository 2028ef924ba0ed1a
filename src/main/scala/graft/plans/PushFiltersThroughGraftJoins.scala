package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown THROUGH the custom join nodes.
  *
  * Catalyst's own PushPredicateThroughJoin only knows the built-in
  * `Join` node, so a custom LogicalPlan is a pushdown BARRIER: a
  * `.where` above [[IntervalJoinNode]]/[[AsOfJoinNode]] stays above
  * the join, runs after it, and — the real cost at scale — never
  * reaches the parquet scan as a PushedFilter/partition prune. A
  * custom operator that silently turns pruned scans into full scans
  * is not "Spark-first"; this rule restores the optimization the
  * node's existence blocked.
  *
  * Soundness per node:
  *  - [[IntervalJoinNode]] is a pure inner join: a deterministic
  *    conjunct referencing only one side's columns filters the same
  *    output pairs whether applied to that side's rows before the
  *    join or to the joined result — BOTH sides push.
  *  - [[AsOfJoinNode]] picks one right row per left row: filtering
  *    rights pre-join RE-MATCHES lefts to a different (earlier/later)
  *    right, which is NOT what a post-join filter on the matched
  *    row's values means — only LEFT-side conjuncts push. (Right-side
  *    output attrs are fresh `outAttrs` anyway, so right predicates
  *    reference no child output and simply stay put.)
  *
  * Non-deterministic conjuncts never move (standard pushdown
  * contract). Key-equality transitivity (a left-key predicate implying
  * the same on the right key) is left to the inner join's own key
  * semantics and not inferred here.
  */
object PushFiltersThroughGraftJoins extends Rule[LogicalPlan] {

  private def split(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }
  private def conj(ps: Seq[Expression]): Option[Expression] =
    ps.reduceOption(And)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, j: IntervalJoinNode) =>
      val preds = split(cond)
      val (lp, rest) = preds.partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      val (rp, keep) = rest.partition(p =>
        p.deterministic && p.references.subsetOf(j.right.outputSet))
      if (lp.isEmpty && rp.isEmpty) f
      else {
        val nj = j.copy(
          left = conj(lp).map(Filter(_, j.left)).getOrElse(j.left),
          right = conj(rp).map(Filter(_, j.right)).getOrElse(j.right))
        conj(keep).map(Filter(_, nj)).getOrElse(nj)
      }

    case f @ Filter(cond, j: AsOfJoinNode) =>
      val preds = split(cond)
      val (lp, keep) = preds.partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (lp.isEmpty) f
      else {
        val nj = j.copy(left = Filter(conj(lp).get, j.left))
        conj(keep).map(Filter(_, nj)).getOrElse(nj)
      }
  }
}

/** Column pruning through the custom join nodes — the other
  * optimization a custom LogicalPlan silently blocks: Catalyst's
  * ColumnPruning doesn't know what [[AsOfJoinNode]] needs from its
  * children, so a narrow Project above the join still makes the (at
  * 100 TB, wide) left side materialize every column through exchange
  * and sort. The rule inserts a child Project keeping only the attrs
  * the downstream Project references plus what the node itself
  * consumes (keys, times, bounds, carried values); the node's output
  * contracts with its left child, so the plan stays consistent and the
  * standard pruning rules take the inserted Project the rest of the
  * way to the scan's ReadSchema.
  *
  * Left side only for [[AsOfJoinNode]] (its right side already
  * narrows to (key, time, values) expressions); both sides of
  * [[IntervalJoinNode]] pass everything through, so both prune.
  */
object PruneColumnsThroughGraftJoins extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  private def prune(child: LogicalPlan, needed: AttributeSet): Option[LogicalPlan] =
    if (child.output.forall(needed.contains)) None
    else Some(Project(child.output.filter(needed.contains), child))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case p @ Project(_, j: AsOfJoinNode) =>
      val needed = AttributeSet(p.references ++
        j.leftKey.references ++ j.leftTime.references)
      prune(j.left, needed)
        .map(nl => p.copy(child = j.copy(left = nl))).getOrElse(p)
    case p @ Project(_, j: IntervalJoinNode) =>
      val neededL = AttributeSet(p.references ++ j.leftKey.references ++
        j.leftStart.references ++ j.leftEnd.references)
      val neededR = AttributeSet(p.references ++ j.rightKey.references ++
        j.rightStart.references ++ j.rightEnd.references)
      val nl = prune(j.left, neededL)
      val nr = prune(j.right, neededR)
      if (nl.isEmpty && nr.isEmpty) p
      else p.copy(child = j.copy(left = nl.getOrElse(j.left),
        right = nr.getOrElse(j.right)))
  }
}
