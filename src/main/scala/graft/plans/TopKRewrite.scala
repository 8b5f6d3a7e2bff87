package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (the `Rule[LogicalPlan]` extension surface): rewrites
  * the idiomatic per-key top-k pattern
  *
  * {{{ Filter(rn <= k, Window(row_number() OVER (PARTITION BY keys ORDER BY ord))) }}}
  *
  * into [[TopKPerKeyPlan]], whose physical form prunes map-side with
  * bounded heaps — the exchange moves ≤ k rows per key per input
  * partition instead of every row of every group (see the plan node's
  * scaladoc for the 100 TB argument). Semantics are identical: both
  * emit exactly the rows row_number would keep, with the same rank
  * attribute (same exprId, so downstream references stay resolved).
  *
  * Fires only on the exact safe shape: a single row_number window
  * expression with the default ROWS UNBOUNDED PRECEDING..CURRENT ROW
  * frame, a non-empty partition spec, and a constant positive bound.
  * Other filter conjuncts are preserved above the rewritten node.
  *
  * Injected by [[graft.GraftExtensions]] (spark.sql.extensions) or via
  * `spark.experimental.extraOptimizations`.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  /** `e` as an upper bound on `attr`: attr <= k / attr < k / k >= attr
    * / k > attr. */
  private def boundOn(e: Expression, attr: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(attr) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(attr) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(attr) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(attr) => Some(v - 1)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(
          Seq(alias @ Alias(
            WindowExpression(_: RowNumber,
              WindowSpecDefinition(part, order,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)) if part.nonEmpty && order.nonEmpty =>
      val rn = alias.toAttribute
      val conjuncts = splitConjuncts(cond)
      val bounds = conjuncts.flatMap(c => boundOn(c, rn).map(c -> _))
      bounds.headOption match {
        case Some((boundExpr, k)) if k > 0 =>
          val rankAttr = AttributeReference(alias.name, IntegerType, nullable = false)(
            exprId = alias.exprId)
          // InferWindowGroupLimit (Spark 3.5+) may already have inserted
          // its sort-based group-limit under the Window; TopKPerKey's
          // heap prune subsumes it, so strip it rather than sort twice
          val input = child match {
            case WindowGroupLimit(p, o, _, _, grandchild)
              if p == part && o == order => grandchild
            case other => other
          }
          val topk = TopKPerKeyPlan(k, part, order, rankAttr, input)
          val rest = conjuncts.filterNot(_ eq boundExpr)
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
        case _ => f
      }
  }
}
