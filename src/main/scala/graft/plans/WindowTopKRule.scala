package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Rewrites the universal SQL top-k-per-group idiom
  *
  * {{{
  * SELECT * FROM (
  *   SELECT ..., row_number() OVER (PARTITION BY g ORDER BY o) rn FROM t
  * ) WHERE rn <= k
  * }}}
  *
  * into the native [[TopKPerGroupPlan]] operator, so the SQL text
  * surface gets the partial-heap plan (bounded heaps per scan
  * partition → survivor-only shuffle → ranked merge) instead of a
  * full-data shuffle + per-group sort through WindowExec. Spark's own
  * InferWindowGroupLimit only inserts a pre-shuffle row filter and
  * still shuffles and sorts the survivors through the Window; this
  * replaces the Window outright.
  *
  * Matches only the exact-semantics case: the Window computes a single
  * `row_number()` (rank/dense_rank tie semantics differ), and the
  * filter bounds it from above with an integer literal (`rn <= k`,
  * `rn < k`, `rn = 1`, and reversed forms). Other conjuncts stay in a
  * residual Filter above the rewritten node. The rank attribute keeps
  * the alias's exprId, so downstream references resolve unchanged.
  *
  * Runs in the operator-optimization batch (fixed point): once the
  * rewrite fires, the Filter+Window pattern is gone, so it cannot
  * re-match its own output.
  */
case class WindowTopKRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def upperBound(c: Expression, rn: ExprId): Option[Int] = c match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rn => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rn => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rn && v == 1 => Some(1)
    case EqualTo(Literal(v: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn && v == 1 => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(parts, orders,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)) if orders.nonEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => upperBound(c, alias.exprId))
      if (bounds.isEmpty || bounds.min < 1) f
      else {
        val k = bounds.min
        val residual = conjuncts.filter(c => upperBound(c, alias.exprId).isEmpty)
        val rankAttr =
          AttributeReference(alias.name, IntegerType, nullable = false)(exprId = alias.exprId)
        val topk = TopKPerGroupPlan(parts, orders, k, rankAttr, child)
        if (residual.isEmpty) topk else Filter(residual.reduce(And), topk)
      }
  }
}
