package graft.plans

import graft.plans.AsOfNative.AsOfJoinPlan
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the native as-of join — prompt preference (c)'s
  * `Rule[LogicalPlan]` leg. Catalyst's PushDownPredicates only knows
  * how to push filters through built-in nodes, so a predicate above
  * [[AsOfJoinPlan]] would otherwise run after the join — after the
  * shuffle, on 100 TB of joined rows instead of at the parquet scan.
  *
  * A conjunct that references only the join KEYS is safe to push into
  * BOTH children (the as-of match is confined to a key group, so
  * dropping non-matching key groups on either side cannot change any
  * surviving row), after which the standard rules carry it through
  * projects/repartitions into the scan's PushedFilters. Time- or
  * value-referencing conjuncts stay above — pruning reference rows by
  * time would change which row is "the latest at or before t".
  */
object AsOfKeyPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val keyAttrMap: Map[Attribute, Attribute] =
        aj.leftKeys.zip(aj.rightKeys).collect {
          case (l: Attribute, r: Attribute) => l -> r
        }.toMap
      val leftKeyAttrs = AttributeSet(keyAttrMap.keys)
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(leftKeyAttrs))
      if (push.isEmpty) f
      else {
        val leftPred = push.reduce(And)
        val rightPred = push.map(_.transform {
          case a: Attribute if keyAttrMap.contains(a) => keyAttrMap(a)
        }).reduce(And).asInstanceOf[Expression]
        val pushed = aj.copy(
          left = Filter(leftPred, aj.left),
          right = Filter(rightPred, aj.right))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
