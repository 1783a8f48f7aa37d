package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering — the write-side half of scan performance.
  *
  * Multi-dimensional range queries (customer × time, user × item)
  * can't be served by sorting on ONE column: rows near in one key
  * scatter in the other, and min/max row-group pruning only helps the
  * sort key. Z-order (Morton) interleaving maps k keys onto one
  * curve that preserves locality in all of them at once — the
  * standard lakehouse `OPTIMIZE ZORDER BY` layout.
  */
object Layout {

  /** Morton code of two non-negative integer columns: bit b of `x`
    * lands at position 2b, bit b of `y` at 2b+1 (`bits` bits each,
    * so the result fits 2·bits ≤ 62 bits). Pure bit arithmetic —
    * codegen'd, scan-parallel, engine-reproducible.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(xl, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftrightunsigned(yl, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduceLeft(_ + _)
  }

  /** Rewrite `df` clustered along the z-curve of (xCol, yCol):
    * range-partition on the z-value (equal-size output files via
    * sampled range bounds), sort within partitions, drop the helper
    * column. Writing the result gives every file a tight z-range —
    * i.e. a tight (x, y) bounding box — so min/max pruning works for
    * range predicates on EITHER column. One shuffle, no driver state.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
