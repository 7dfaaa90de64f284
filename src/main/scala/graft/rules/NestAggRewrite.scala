package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule (SURVEY §7.1 layer 5, §2.1 #7): the reference's
  * group-by turns every non-key variable into a per-group LIST, and
  * aggregation is an ordinary function over that list
  * (`Executor.py:440-448`, `tutorial_tests.py:13-20`). Declared
  * faithfully, that plan collects whole groups into memory. This rule
  * rewrites the collect-then-reduce patterns into native Spark
  * aggregates — partial (map-side) + final, no group materialization:
  *
  *   size(collect_list(c))               → count(c)   (cast to int)
  *   array_max(collect_list(c))          → max(c)
  *   array_min(collect_list(c))          → min(c)
  *   aggregate(collect_list(c), 0, +)    → coalesce(sum(c), 0)
  *     (long/double elements only — sum(int) widens to long, which
  *      would change the expression's type)
  *
  * All four respect collect_list's null-skipping (count/max/min/sum
  * ignore nulls; the coalesce restores `aggregate`'s zero for
  * all-null groups). The collect_list itself is left in place — if
  * nothing else references it, Catalyst's ColumnPruning removes it.
  *
  * Runs in the user-rule batch, i.e. after CollapseProject has merged
  * the reducing projection into the Aggregate node, so the pattern is
  * a single Aggregate whose result expressions wrap the collect.
  */
object NestAggRewrite extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0, _) => true
    case Literal(0L, _) => true
    case Literal(0.0, _) => true
    case _ => false
  }

  /** merge lambda is literally (acc, x) -> acc + x */
  private def isPlusLambda(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _) =>
      Set(a.exprId, b.exprId) == Set(p1.exprId, p2.exprId)
    case _ => false
  }

  /** finish lambda is identity */
  private def isIdentityLambda(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) =>
      v.exprId == p.exprId
    case _ => false
  }

  private object PlainCollectList {
    def unapply(e: Expression): Option[Expression] = e match {
      case AggregateExpression(CollectList(c, _, _), _, false, None, _) =>
        Some(c)
      case _ => None
    }
  }

  /** collect_list(c), optionally wrapped in transform(_, x -> f(x)) —
    * yields the per-ROW element expression (f applied to c). The
    * mapped form is only safe when BOTH
    *   - f(c) cannot be null: collect_list already dropped null
    *     elements, but a transform can INTRODUCE nulls, which
    *     `aggregate`'s `+` propagates while sum/count/max skip; and
    *   - c itself cannot be null: collect_list drops null c BEFORE f
    *     runs, so a null-ABSORBING f (e.g. x -> coalesce(x, 0)) sees
    *     fewer elements in the list form than the substituted f(c)
    *     per-row form would — count/max/min over f(c) would include
    *     rows the list never contained.
    */
  private object CollectListMapped {
    def unapply(e: Expression): Option[Expression] = e match {
      case PlainCollectList(c) => Some(c)
      case ArrayTransform(PlainCollectList(c),
          LambdaFunction(f, Seq(v: NamedLambdaVariable), _)) if !c.nullable =>
        val substituted = f.transformUp {
          case nv: NamedLambdaVariable if nv.exprId == v.exprId => c
        }
        if (substituted.nullable) None else Some(substituted)
      case _ => None
    }
  }

  private def sumOk(c: Expression): Boolean =
    c.dataType == LongType || c.dataType == DoubleType

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // Form 1: the reducing projection was NOT collapsed into the
    // Aggregate (the list attribute is referenced several times) —
    // rewrite through the attribute, appending native aggregates to
    // the Aggregate node. If the list ends up unreferenced,
    // ColumnPruning drops the collect_list afterwards.
    case p @ Project(projList, agg: Aggregate) =>
      val listMap: Map[ExprId, Expression] = agg.aggregateExpressions.collect {
        case al @ Alias(CollectListMapped(c), _) => al.exprId -> c
      }.toMap
      if (listMap.isEmpty) p
      else {
        val added = scala.collection.mutable.ArrayBuffer[NamedExpression]()
        def add(e: Expression): Expression = {
          val al = Alias(e, s"_nestagg_${added.size}")()
          added += al
          al.toAttribute
        }
        val newProj = projList.map(_.transformUp {
          case Size(ar: AttributeReference, _) if listMap.contains(ar.exprId) =>
            Cast(add(Count(listMap(ar.exprId)).toAggregateExpression()),
              IntegerType)
          case ArrayMax(ar: AttributeReference) if listMap.contains(ar.exprId) =>
            add(Max(listMap(ar.exprId)).toAggregateExpression())
          case ArrayMin(ar: AttributeReference) if listMap.contains(ar.exprId) =>
            add(Min(listMap(ar.exprId)).toAggregateExpression())
          case ArrayAggregate(ar: AttributeReference, zero,
              merge: LambdaFunction, finish: LambdaFunction)
              if listMap.contains(ar.exprId) && isZero(zero) &&
                isPlusLambda(merge) && isIdentityLambda(finish) &&
                sumOk(listMap(ar.exprId)) =>
            val c = listMap(ar.exprId)
            Coalesce(Seq(add(Sum(c).toAggregateExpression()),
              Literal.default(c.dataType)))
        }.asInstanceOf[NamedExpression])
        if (added.isEmpty) p
        else Project(newProj,
          agg.copy(aggregateExpressions = agg.aggregateExpressions ++ added.toSeq))
      }

    // Form 2: CollapseProject merged the reduction into the Aggregate's
    // result expressions — rewrite in place.
    case agg: Aggregate =>
      val newExprs = agg.aggregateExpressions.map { ne =>
        ne.transformUp {
          case Size(CollectListMapped(c), _) =>
            Cast(Count(c).toAggregateExpression(), IntegerType)
          case ArrayMax(CollectListMapped(c)) =>
            Max(c).toAggregateExpression()
          case ArrayMin(CollectListMapped(c)) =>
            Min(c).toAggregateExpression()
          case ArrayAggregate(CollectListMapped(c), zero,
              merge: LambdaFunction, finish: LambdaFunction)
              if isZero(zero) && isPlusLambda(merge) &&
                isIdentityLambda(finish) && sumOk(c) =>
            Coalesce(Seq(Sum(c).toAggregateExpression(),
              Literal.default(c.dataType)))
        }.asInstanceOf[NamedExpression]
      }
      agg.copy(aggregateExpressions = newExprs)
  }
}
