package graft.rules

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, Expression, GreaterThanOrEqual, Literal, Multiply, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.SortedJaccard

/** Catalyst optimizer rule: prepend a length-ratio guard to Jaccard
  * threshold filters.
  *
  * Soundness: J(A,B) = |A∩B|/|A∪B| ≥ t implies |A∩B| ≥ t·|A∪B| ≥
  * t·max(|A|,|B|), and |A∩B| ≤ min(|A|,|B|), so min(|A|,|B|) ≥
  * t·max(|A|,|B|). The guard `size(a) ≥ t·size(b) AND size(b) ≥
  * t·size(a)` therefore never removes a qualifying pair — it only lets
  * the conjunction short-circuit BEFORE the O(n+m) merge-Jaccard runs.
  * On a near-dup candidate join most pairs fail the threshold, so most
  * merge evaluations are skipped for two array-length loads.
  *
  * The rule is registered via
  * [[graft.GraftExtensions]]`.injectOptimizerRule`, runs inside the
  * operator-optimization fixpoint (after predicate pushdown inlines the
  * jaccard expression into the Filter), and is idempotent: a filter
  * whose conjuncts already contain the guard is left unchanged.
  *
  * When to use: ad-hoc sessions filtering on a bare jaccard threshold.
  * Pipelines that already block by length (the `ngramJaccardPairs`
  * length band) gain nothing — the guard is then pure per-row overhead
  * (~15% measured on d4) — which is why `Sessions.local` does not
  * inject it.
  */
object JaccardLengthPruning extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def guard(a: Expression, b: Expression, t: Double): Seq[Expression] = {
    val sa = Cast(Size(a, legacySizeOfNull = false), DoubleType)
    val sb = Cast(Size(b, legacySizeOfNull = false), DoubleType)
    Seq(
      GreaterThanOrEqual(sa, Multiply(Literal(t), sb)),
      GreaterThanOrEqual(sb, Multiply(Literal(t), sa))
    )
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      var changed = false
      // splice each guard IMMEDIATELY before its jaccard conjunct: the
      // cheaper conjuncts ahead of it (id ordering, blocking predicates)
      // keep short-circuiting first — prepending the guards globally
      // would evaluate them on every pre-filter row and cost more than
      // the merge they skip
      val rebuilt = conjuncts.flatMap {
        // fire only when both sides are bare attributes: the guard
        // re-evaluates its children, so on inline expression trees
        // (graft_shingle_hashes(...) written directly in the predicate)
        // Size(child) would recompute the whole array per row and the
        // rule would pessimize exactly what it means to speed up
        case g @ GreaterThanOrEqual(sj: SortedJaccard, Literal(t: Double, DoubleType))
            if t > 0.0 && sj.left.isInstanceOf[Attribute] && sj.right.isInstanceOf[Attribute] =>
          val gs = guard(sj.left, sj.right, t).filterNot(x => conjuncts.exists(_.semanticEquals(x)))
          if (gs.nonEmpty) changed = true
          gs :+ g
        case other => Seq(other)
      }
      if (!changed) f else Filter(rebuilt.reduceLeft(And), child)
  }
}
