package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skew and scale.
  *
  * AQE's skew-join split (on by default) handles most runtime skew; the
  * explicit salted join is for the extreme case — one key holding a
  * double-digit percentage of rows — where even split shuffle blocks
  * overload, or when AQE is unavailable (e.g. inside cached plans).
  */
object Joins {

  /** Salted equi-join: the skewed (left) side gets a deterministic salt
    * in [0, saltFactor) hashed from `saltSource` (a high-cardinality
    * column); the right side is replicated saltFactor times. The join
    * key becomes (key, salt) — the hot key's rows spread over
    * saltFactor reducers. Result is row-identical to the plain join.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, joinCond: Column,
      saltSource: Column, saltFactor: Int): DataFrame = {
    val sl = left.withColumn("__salt", pmod(hash(saltSource), lit(saltFactor)))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    sl.join(sr, joinCond && sl("__salt") === sr("__salt"))
      .drop("__salt")
  }

  /** Binned range join: points ⋈ intervals on lo ≤ p ≤ hi WITHOUT the
    * nested-loop plan Spark gives a pure inequality join (interpreted
    * BroadcastNestedLoopJoin, O(|points|·|intervals|) comparisons).
    *
    * Both sides are binned at `binWidth`: a point lands in exactly ONE
    * bin; an interval replicates to each bin it overlaps
    * (explode(sequence(floor(lo/w), floor(hi/w)))). The join is then a
    * plain shuffled/broadcast HASH join on the bin id plus the exact
    * residual filter — each matching pair meets exactly once (in the
    * point's bin), so no dedup is needed. Shuffle volume is
    * |points| + |intervals|·(span/binWidth + 1); pick binWidth near the
    * median interval span. This is the standard engine-level
    * range-join-binning optimization, expressed compositionally.
    */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
