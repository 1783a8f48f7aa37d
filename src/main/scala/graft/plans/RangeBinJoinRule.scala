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
  * Outlier handling: an interval spanning more than
  * `spark.graft.rangeJoin.maxBins` bins (default 4096 — e.g. a
  * mis-entered open-ended interval) would explode into a huge or
  * Sequence-overflowing bin list. Such rows are routed through a
  * fallback branch that keeps the original nested-loop condition, and
  * the two branches are UNIONed — every row goes through exactly one
  * branch, so the rewrite stays row-identical while the binned branch
  * handles the (normal-width) bulk. The fallback branch costs a second
  * scan of both inputs; set maxBins <= 0 to disable it (pure binned
  * rewrite) when every interval is known-bounded.
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (> 0 enables; pick a
  * width near the median interval span). Only unhinted joins are
  * rewritten; the fallback branch carries an empty HintInfo as a
  * processed marker so the optimizer's fixed-point pass cannot
  * re-match it. Installed by [[graft.GraftExtensions]].
  */
case class RangeBinJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  private val widthKey = "spark.graft.rangeJoin.binWidth"
  private val maxBinsKey = "spark.graft.rangeJoin.maxBins"

  private def numericConf(key: String, default: String): Double = {
    val raw = SQLConf.get.getConfString(key, default)
    try raw.toDouble
    catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$key must be numeric, got '$raw'")
    }
  }

  private def binWidth: Double = numericConf(widthKey, "0")

  /** None = uncapped (no fallback branch — set maxBins <= 0 when every
    * interval is known-bounded and the second scan of both inputs that
    * the fallback branch costs is not worth paying).
    */
  private def maxBins: Option[Long] = {
    val m = numericConf(maxBinsKey, "4096")
    if (m < 1) None else Some(m.toLong)
  }

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
      case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE)
          if conjuncts(cond).length == 2 =>
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
              rewrite(j, pointOnLeft = true, p1, lo, hi, w, left, right, cond)
            else if (pRefs.nonEmpty && loHiRefs.nonEmpty &&
                pRefs.subsetOf(right.outputSet) && loHiRefs.subsetOf(left.outputSet))
              rewrite(j, pointOnLeft = false, p1, lo, hi, w, left, right, cond)
            else j
          case _ => j
        }
    }
  }

  private def rewrite(j: Join, pointOnLeft: Boolean, p: Expression,
      lo: Expression, hi: Expression, w: Double,
      left: LogicalPlan, right: LogicalPlan, cond: Expression): LogicalPlan = {
    val pointPlan = if (pointOnLeft) left else right
    val boundPlan = if (pointOnLeft) right else left
    val binLo = bin(lo, w)
    val binHi = bin(hi, w)
    // span guard: rows whose interval fits maxBins bins go through the
    // binned hash join; wider (outlier) rows through the naive fallback.
    // A NULL span (null bound) matches nothing under the original
    // condition either, so both filters dropping it is row-identical.
    val narrow = maxBins.map(m =>
      LessThanOrEqual(Subtract(binHi, binLo), Literal(m - 1L)))

    val pBinAlias = Alias(bin(p, w), "__graft_bin_p")()
    val newPoint = Project(pointPlan.output :+ pBinAlias, pointPlan)
    val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = false)()
    val seq = Sequence(binLo, binHi, None, Some(SQLConf.get.sessionLocalTimeZone))
    val narrowBound = narrow.map(Filter(_, boundPlan)).getOrElse(boundPlan)
    val newBound = Generate(Explode(seq), Nil, outer = false, None, Seq(binAttr),
      narrowBound)
    val (newLeft, newRight) =
      if (pointOnLeft) (newPoint, newBound) else (newBound, newPoint)
    val newCond = And(EqualTo(pBinAlias.toAttribute, binAttr), cond)
    val binned = Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), JoinHint.NONE))

    narrow match {
      case None => binned
      case Some(n) =>
        // fallback branch: original condition, outlier interval rows
        // only. The empty-HintInfo marker keeps this rule (which only
        // matches JoinHint.NONE) from re-binning it on the next
        // fixed-point pass; the planner ignores a HintInfo with no
        // strategy.
        val markerHint = JoinHint(Some(HintInfo()), None)
        val wideBound = Filter(Not(n), boundPlan)
        val (wideLeft, wideRight) =
          if (pointOnLeft) (pointPlan, wideBound) else (wideBound, pointPlan)
        val wide = Project(j.output, Join(wideLeft, wideRight, Inner, Some(cond), markerHint))
        Union(binned, wide)
    }
  }
}
