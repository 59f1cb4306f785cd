package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeMap, Expression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Restores predicate pushdown PAST an [[Opaque]] barrier for the
  * predicates the barrier was never meant to block.
  *
  * Why: `Opaque` reports `deterministic = false`, and Spark's
  * `PushPredicateThroughNonJoin` refuses to transpose ANY filter
  * through a Project containing a nondeterministic field — so after
  * `gopherQuality`/`gopherRepetition`/`c4Clean`, even a partition-
  * pruning `filter($"source" === …)` stopped reaching the parquet
  * scan. That is collateral damage: the barrier exists to stop the
  * VERDICT expression being inlined into filters, not to pin
  * unrelated predicates.
  *
  * This rule (registered by `Tables.tune` via
  * `spark.experimental.extraOptimizations`, so every graft entry
  * point gets it) transposes the safe conjuncts itself: a conjunct
  * moves below the Project iff it is deterministic, subquery-free,
  * and references only PASS-THROUGH columns (bare attributes or
  * simple renames). Conjuncts touching any computed column — the
  * Opaque verdict, but also unwrapped metric columns, whose
  * re-evaluation below the Project is exactly what the barrier
  * prevents — stay above. After the transposition the filter sits
  * over plain deterministic projections, so FileSourceStrategy
  * collects it into PushedFilters at physical planning.
  */
object PushThroughOpaque extends Rule[LogicalPlan] with PredicateHelper {

  private def hasOpaque(e: Expression): Boolean =
    e.exists(_.isInstanceOf[Opaque])

  /** Transpose the pass-through conjuncts of `f` below its Project
    * child; `None` if nothing moved. Only conjuncts whose references
    * are bare attributes or simple renames move — never anything that
    * would re-evaluate a computed column below the projection. */
  private def transpose(f: Filter): Option[LogicalPlan] = f match {
    case Filter(cond, Project(fields, child)) =>
      val aliasMap = AttributeMap(fields.collect {
        case a: Alias => (a.toAttribute, a.child)
      })
      def passThrough(a: Attribute): Boolean = aliasMap.get(a) match {
        case None => child.outputSet.contains(a) // projected as-is
        case Some(_: Attribute) => true          // simple rename
        case Some(_) => false                    // computed (incl. Opaque)
      }
      val (push, keep) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic &&
          !c.exists(_.isInstanceOf[PlanExpression[_]]) &&
          c.references.forall(passThrough))
      if (push.isEmpty) None
      else {
        val below = push.map(_.transform {
          case a: Attribute => aliasMap.get(a) match {
            case Some(att: Attribute) => att
            case _ => a
          }
        }).reduce(And)
        val projected = Project(fields, Filter(below, child))
        Some(keep.reduceOption(And).map(Filter(_, projected))
          .getOrElse(projected))
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // The Opaque Project itself: move safe conjuncts one level down.
    case f @ Filter(_, Project(fields, _)) if fields.exists(hasOpaque) =>
      transpose(f).getOrElse(f)
    // Once below the barrier the filter is PAST Spark's own pushdown
    // batch, so this rule must finish the descent through the
    // battery's deterministic staging Projects itself — otherwise
    // PhysicalOperation never sees the filter adjacent to the scan
    // (it stops collecting at the nondeterministic top Project) and
    // PushedFilters stays empty. Same pass-through-only policy; the
    // rule runs to fixed point, so the filter walks down one Project
    // per iteration until it reaches the relation.
    case f @ Filter(_, Project(fields, _)) if fields.forall(_.deterministic) =>
      transpose(f).getOrElse(f)
  }
}
