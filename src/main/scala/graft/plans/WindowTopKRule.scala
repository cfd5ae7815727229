package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, CurrentRow, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NamedExpression, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the `row_number() OVER (PARTITION BY ...
  * ORDER BY ...) <= k` window-plus-filter idiom into the native
  * [[TopKPerGroup]] operator — the engine applies the bounded-heap plan
  * TRANSPARENTLY, so any query written in the standard SQL idiom gets
  * it (the same way Spark's own InferWindowGroupLimit kicks in, except
  * that rule still sorts every partition and runs the Window; this one
  * eliminates sort and Window entirely).
  *
  * Matched shapes (both arise from `.withColumn("rn", row_number()
  * .over(w)).filter($"rn" <= k)` depending on where predicate pushdown
  * has gotten to in the fixed point):
  *  - Filter(cond, Window(Seq(row_number alias), parts, order, child))
  *  - Filter(cond, Project(list, Window(...))) with cond referencing
  *    the window attr through the project's (possibly Cast) alias
  * `cond` may be a conjunction: exactly one conjunct must bound the
  * rank (<=, <, >=/> flipped, or = 1); the rest stay in a residual
  * Filter. The rank bound k is capped (heap memory is O(groups·k)) and
  * the partition spec must be non-empty (the global-top-k case belongs
  * to TakeOrderedAndProject).
  *
  * Correctness face: `q_topk_per_group` — written as the window idiom —
  * now PLANS as TopKPerGroupExec yet still hash-matches its DuckDB
  * oracle; WindowTopKRuleSpec pins both plan shape and bit-equality
  * against a rule-disabled run.
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  private val maxK = 10000

  private object KLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType)
          if v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }

  /** The single row_number window expression of `w`, if that is all it
    * computes (more expressions ⇒ the Window must stay). */
  private def rowNumberOf(w: Window): Option[Attribute] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
        if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
      Some(a.toAttribute)
    case _ => None
  }

  /** Strip an order-preserving widening cast (int rank compared as long). */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(child, LongType, _, _) => child
    case _ => e
  }

  private def refersTo(e: Expression, target: Attribute): Boolean =
    stripCast(e) match {
      case a: Attribute => a.exprId == target.exprId
      case _ => false
    }

  /** k such that `cond` ⟺ rank <= k, if cond is such a bound. */
  private def boundOf(cond: Expression, target: Attribute): Option[Int] = {
    val k = cond match {
      case LessThanOrEqual(l, KLit(v)) if refersTo(l, target) => Some(v)
      case LessThan(l, KLit(v)) if refersTo(l, target) => Some(v - 1)
      case GreaterThanOrEqual(KLit(v), r) if refersTo(r, target) => Some(v)
      case GreaterThan(KLit(v), r) if refersTo(r, target) => Some(v - 1)
      case EqualTo(l, KLit(1)) if refersTo(l, target) => Some(1)
      case EqualTo(KLit(1), r) if refersTo(r, target) => Some(1)
      case _ => None
    }
    k.filter(v => v >= 1 && v <= maxK)
  }

  /** Resolve `cond`'s rank reference through a project list: an alias
    * whose child is the window attr or a widening cast of it. */
  private def throughProject(list: Seq[NamedExpression],
                             weAttr: Attribute): Seq[Attribute] =
    weAttr +: list.collect {
      case a: Alias if refersTo(a.child, weAttr) => a.toAttribute
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def extract(cond: Expression, targets: Seq[Attribute])
      : Option[(Int, Seq[Expression])] = {
    val conjuncts = splitConjuncts(cond)
    val bounds = conjuncts.flatMap(c =>
      targets.flatMap(t => boundOf(c, t)).headOption.map(c -> _))
    bounds match {
      case Seq((pred, k)) => Some((k, conjuncts.filterNot(_ eq pred)))
      case _ => None
    }
  }

  private def topK(w: Window, k: Int, weAttr: Attribute): TopKPerGroup =
    TopKPerGroup(w.partitionSpec, w.orderSpec, k, weAttr, w.child)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      (for {
        weAttr <- rowNumberOf(w)
        (k, rest) <- extract(cond, Seq(weAttr))
      } yield {
        val node = topK(w, k, weAttr)
        rest.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, node)).getOrElse(node)
      }).getOrElse(f)
    case f @ Filter(cond, p @ Project(list, w: Window)) =>
      (for {
        weAttr <- rowNumberOf(w)
        (k, rest) <- extract(cond, throughProject(list, weAttr))
      } yield {
        val node = Project(list, topK(w, k, weAttr))
        rest.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, node)).getOrElse(node)
      }).getOrElse(f)
  }
}
