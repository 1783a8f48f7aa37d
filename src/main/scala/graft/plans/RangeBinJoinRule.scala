package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: automatic range-join binning.
  *
  * A join whose condition is a pure inequality band — `lo ≤ p AND
  * p ≤ hi` with the point on one side and both bounds on the other,
  * and NO equality conjunct — is planned by Spark as a
  * BroadcastNestedLoopJoin: O(|L|·|R|) interpreted comparisons, the
  * classic cluster-killer for interval joins. This rule rewrites the
  * logical plan into the binned form (`graft.operators.Joins
  * .binnedRangeJoin` as an optimization instead of an API): the point
  * side projects `floor(p/w)`, the interval side `explode`s
  * `sequence(floor(lo/w), floor(hi/w))`, and the join becomes a HASH
  * join on the bin id with the original band kept as the residual
  * filter. A point has exactly one bin, so each qualifying pair meets
  * exactly once — row-identical to the naive plan (spec-verified).
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (> 0 enables; pick a
  * width near the median interval span). Idempotent: the rewritten
  * condition gains an equality conjunct, so the pattern no longer
  * matches. Installed by [[graft.GraftExtensions]].
  */
case class RangeBinJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  private val confKey = "graft.rangeJoin.binWidth"

  private def binWidth: Double =
    SQLConf.get.getConfString(s"spark.$confKey", "0").toDouble

  /** (point, bound, pointIsLowerBounded): normalize `a cmp b` so the
    * result is Some((p, bound, isLower)) meaning `p ≥ bound` (isLower)
    * or `p ≤ bound` (!isLower); strictness stays in the residual.
    */
  private def asBound(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(a, b) => Some((a, b, true))
    case GreaterThan(a, b)        => Some((a, b, true))
    case LessThanOrEqual(a, b)    => Some((a, b, false))
    case LessThan(a, b)           => Some((a, b, false))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

  private def bin(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if conjuncts(cond).length == 2 =>
        val cs = conjuncts(cond).map(asBound)
        (cs(0), cs(1)) match {
          case (Some((p1, b1, low1)), Some((p2, b2, low2)))
              if p1.semanticEquals(p2) && low1 != low2 &&
                numeric(p1) && numeric(b1) && numeric(b2) &&
                p1.deterministic && b1.deterministic && b2.deterministic =>
            val (lo, hi) = if (low1) (b1, b2) else (b2, b1)
            val pRefs = p1.references
            val loHiRefs = lo.references ++ hi.references
            if (pRefs.nonEmpty && loHiRefs.nonEmpty &&
                pRefs.subsetOf(left.outputSet) && loHiRefs.subsetOf(right.outputSet))
              rewrite(j, pointOnLeft = true, p1, lo, hi, w, left, right, cond, hint)
            else if (pRefs.nonEmpty && loHiRefs.nonEmpty &&
                pRefs.subsetOf(right.outputSet) && loHiRefs.subsetOf(left.outputSet))
              rewrite(j, pointOnLeft = false, p1, lo, hi, w, left, right, cond, hint)
            else j
          case _ => j
        }
    }
  }

  private def rewrite(j: Join, pointOnLeft: Boolean, p: Expression,
      lo: Expression, hi: Expression, w: Double,
      left: LogicalPlan, right: LogicalPlan, cond: Expression,
      hint: JoinHint): LogicalPlan = {
    val pointPlan = if (pointOnLeft) left else right
    val boundPlan = if (pointOnLeft) right else left
    val pBinAlias = Alias(bin(p, w), "__graft_bin_p")()
    val newPoint = Project(pointPlan.output :+ pBinAlias, pointPlan)
    val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = false)()
    val seq = Sequence(bin(lo, w), bin(hi, w), None,
      Some(SQLConf.get.sessionLocalTimeZone))
    val newBound = Generate(Explode(seq), Nil, outer = false, None, Seq(binAttr), boundPlan)
    val (newLeft, newRight) =
      if (pointOnLeft) (newPoint, newBound) else (newBound, newPoint)
    val newCond = And(EqualTo(pBinAlias.toAttribute, binAttr), cond)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
