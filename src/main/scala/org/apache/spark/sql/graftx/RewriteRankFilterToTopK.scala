package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the canonical top-k-per-group pattern
  *
  *   df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *     .where($"rn" <= k)
  *
  * into the custom [[TopKPerKey]] operator, so the user writes the
  * idiomatic window form and the engine still plans map-side bounded
  * heaps (≤ k rows per key per partition into the shuffle) instead of
  * shuffling and sorting every row.
  *
  * Deliberately narrow — the rewrite fires only when ALL of:
  *  - the Window computes exactly ONE expression, a `row_number()` (any
  *    additional window function needs the full frame, so the heap
  *    short-circuit would be wrong);
  *  - the window is partitioned (a global top-k is TakeOrderedAndProject's
  *    job, and an unpartitioned heap stage would add nothing);
  *  - a conjunct of the Filter bounds that row_number by a literal
  *    (`rn <= k`, `rn < k`, or `rn = 1`) — the bound becomes the heap
  *    size; remaining conjuncts stay in a residual Filter.
  *
  * An optional pass-through Project between Filter and Window (what
  * `withColumn` produces) is preserved above the rewritten node. Runs in
  * the operator-optimization batch via
  * `GraftExtensions.injectOptimizerRule`; `transformUp` consumes the
  * pattern, so the rule is idempotent.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  /** k from a rank-bound conjunct on `rn`, if this conjunct is one. */
  private def bound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case _ => None
  }

  private def splitRankBound(cond: Expression, rn: Attribute): Option[(Int, Seq[Expression])] = {
    val conjuncts = {
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      split(cond)
    }
    val ks = conjuncts.flatMap(c => bound(c, rn).map(k => (k, c)))
    ks.headOption.map { case (k, used) =>
      (k, conjuncts.filterNot(_ eq used))
    }
  }

  private def rewrite(cond: Expression, w: Window): Option[(LogicalPlan, Seq[Expression])] =
    w match {
      case Window(Seq(a @ Alias(WindowExpression(_: RowNumber, spec), _)),
          parts, order, child, _)
          if parts.nonEmpty && order.nonEmpty &&
            spec.frameSpecification.isInstanceOf[SpecifiedWindowFrame] =>
        splitRankBound(cond, a.toAttribute).map { case (k, rest) =>
          (TopKPerKey(parts, order, k, a.toAttribute, child), rest)
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Knob for paired benchmarking against Spark 4's native
    // InferWindowGroupLimit path (WindowGroupLimitExec): with the rewrite
    // off, the same query plans through the built-in operator — see
    // DESIGN.md for the measured comparison justifying the custom plan.
    if (!conf.getConfString("spark.graft.topk.rewrite.enabled", "true").toBoolean) plan
    else applyRewrite(plan)
  }

  private def applyRewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Filter directly over Window
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w) match {
        case Some((topk, rest)) =>
          rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)
        case None => f
      }
    // withColumn shape: Filter over a pass-through Project over Window
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(cond, w) match {
        case Some((topk, rest)) =>
          val filtered = rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)
          Project(projList, filtered)
        case None => f
      }
  }
}
