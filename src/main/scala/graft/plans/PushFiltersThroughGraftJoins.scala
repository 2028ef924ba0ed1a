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
