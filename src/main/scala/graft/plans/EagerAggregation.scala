package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Eager aggregation (partial-aggregate pushdown through a join).
  *
  * Spark's optimizer never moves an Aggregate below a Join, so a query
  * like TPC-H q18 — `GROUP BY order keys, SUM(l_quantity)` over
  * `customer ⋈ orders ⋈ lineitem` — streams every fact row through the
  * join before reducing it. For an INNER equi-join this rewrite is
  * semantics-preserving whenever the aggregate inputs come from one side
  * only and the grouping keys from the other: pre-aggregate the fact
  * side by its join-condition attributes, join the (far smaller) partial
  * rows, and re-aggregate above. Each partial row then joins exactly as
  * many times as each of its source rows did, so
  *   SUM(x)   == SUM(partial_sum_x)
  *   COUNT(x) == SUM(partial_count_x)   (COUNT(*) likewise)
  *   MIN/MAX  == MIN/MAX(partial)
  * hold regardless of key multiplicity on either side. Decimal partial
  * sums re-sum exactly, so the engine's determinism contract (Q.decSum)
  * is unchanged.
  *
  * At 100 TB this is the difference between shuffling the fact table
  * into the join and shuffling one row per (join key): the rewrite cuts
  * both the join's probe volume and the post-join aggregation state.
  *
  * Deliberately narrow (bails otherwise): inner joins, non-distinct
  * unfiltered SUM/COUNT/MIN/MAX, aggregate inputs wholly from one join
  * side, grouping expressions wholly from the other, pushed side not
  * already an Aggregate (also the refire guard: the rewritten plan has
  * an Aggregate there). Registered via GraftExtensions
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object EagerAggregation extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(_, _, join: Join, _) =>
      rewrite(agg, join).getOrElse(agg)
    // column pruning interposes an attribute-only Project between the
    // Aggregate and the Join; it is transparent for this rewrite (the
    // attribute ids pass through), and ColumnPruning re-derives it on
    // the rewritten plan in the same fixed-point batch.
    case agg @ Aggregate(_, _, Project(projList, join: Join), _)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(agg.copy(child = join), join).getOrElse(agg)
  }

  private def supported(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Sum | _: Count | _: Min | _: Max => true
      case _ => false
    })

  private def rewrite(agg: Aggregate, join: Join): Option[Aggregate] = {
    if (join.joinType != Inner || join.condition.isEmpty) return None
    val aggFns = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    if (aggFns.isEmpty || !aggFns.forall(supported)) return None
    val fnRefs = AttributeSet(aggFns.flatMap(_.references))
    val groupRefs = AttributeSet(agg.groupingExpressions.flatMap(_.references))

    // pick the side that feeds ALL aggregate inputs and NO grouping key
    val pushed = Seq(join.left, join.right).find { side =>
      (fnRefs.nonEmpty && fnRefs.subsetOf(side.outputSet)) &&
        groupRefs.intersect(side.outputSet).isEmpty &&
        !side.isInstanceOf[Aggregate] // also prevents refiring on our own output
    }.getOrElse(return None)
    val other = if (pushed eq join.left) join.right else join.left

    // every pushed-side attribute the join condition touches becomes a
    // partial grouping key, so the condition stays row-evaluable above
    val pushedKeys = join.condition.get.references.intersect(pushed.outputSet).toSeq
    if (pushedKeys.isEmpty) return None

    // one partial per distinct aggregate call (canonicalized)
    val uniqueFns = aggFns.foldLeft(Seq.empty[AggregateExpression]) { (acc, ae) =>
      if (acc.exists(_.canonicalized == ae.canonicalized)) acc else acc :+ ae
    }
    val partialAlias = uniqueFns.map { ae =>
      ae -> Alias(ae, "_eager_partial")()
    }
    val pushedAgg = Aggregate(pushedKeys, pushedKeys ++ partialAlias.map(_._2), pushed)

    def finalFn(ae: AggregateExpression, partial: Attribute): AggregateExpression =
      ae.aggregateFunction match {
        case _: Sum => ae.copy(aggregateFunction = Sum(partial))
        case _: Count => ae.copy(aggregateFunction = Sum(partial))
        case _: Min => ae.copy(aggregateFunction = Min(partial))
        case _: Max => ae.copy(aggregateFunction = Max(partial))
        case _ => ae // unreachable (supported() gate)
      }

    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transform {
        case ae: AggregateExpression =>
          partialAlias.find(_._1.canonicalized == ae.canonicalized) match {
            case Some((_, alias)) => finalFn(ae, alias.toAttribute)
            case None => ae
          }
      }.asInstanceOf[NamedExpression]
    }
    val newJoin = if (pushed eq join.left) join.copy(left = pushedAgg)
      else join.copy(right = pushedAgg)
    Some(agg.copy(aggregateExpressions = newAggExprs, child = newJoin))
  }
}
