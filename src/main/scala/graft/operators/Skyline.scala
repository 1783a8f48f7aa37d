package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2D skyline (Pareto front), maximizing both dimensions.
  *
  * The skyline operator is distributive: skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B)). Phase 1 therefore computes each
  * partition's local skyline in a JVM kernel (sort by x desc, keep
  * rows whose y strictly exceeds the running max — O(p log p) per
  * partition, no shuffle), discarding everything dominated locally;
  * phase 2 runs the exact dominance test over the (small) union of
  * survivors with two incremental window aggregates — max(y) per
  * distinct x and a prefix running max over x descending. At 100 TB
  * phase 1 does all the data reduction scan-side; phase 2 sees only
  * per-partition fronts (≤ |distinct x| rows each, typically tiny).
  *
  * Dominance: q dominates p iff xq ≥ xp ∧ yq ≥ yp ∧ (xq > xp ∨ yq > yp).
  * Duplicate (x, y) points on the front all survive.
  */
object Skyline {

  /** Rows of `df` not dominated on (xCol, yCol), both maximized.
    * Integer/long dimensions; output keeps all original columns.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val xi = schema.fieldIndex(xCol)
    val yi = schema.fieldIndex(yCol)
    // Phase 1: local skyline per partition. Sort by (x desc, y desc);
    // a row survives iff its y is >= the running max so far AND it is
    // not strictly dominated by the previous distinct-x max.
    val local = df.mapPartitions { it =>
      val rows = it.toArray
      if (rows.length <= 1) rows.iterator
      else {
        def xOf(r: org.apache.spark.sql.Row) = r.get(xi) match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"skyline dimension must be int/long, got $other")
        }
        def yOf(r: org.apache.spark.sql.Row) = r.get(yi) match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"skyline dimension must be int/long, got $other")
        }
        val sorted = rows.sortBy(r => (-xOf(r), -yOf(r)))
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        var bestYStrict = Long.MinValue // max y among STRICTLY larger x
        var i = 0
        while (i < sorted.length) {
          val x = xOf(sorted(i))
          // all rows sharing this x: survivors are those with y == group
          // max (ties kept), provided group max beats bestYStrict
          var j = i
          val gmax = yOf(sorted(i)) // sorted y desc within x
          while (j < sorted.length && xOf(sorted(j)) == x) {
            if (yOf(sorted(j)) == gmax && gmax > bestYStrict) out += sorted(j)
            j += 1
          }
          if (gmax > bestYStrict) bestYStrict = gmax
          i = j
        }
        out.iterator
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    // Phase 2: exact global dominance over the survivors (small), via
    // incremental windows — never a self-join or shrinking frame.
    val gmax = local.groupBy(col(xCol)).agg(max(col(yCol)).as("__gy"))
    val wd = Window.orderBy(col(xCol).desc).rowsBetween(Window.unboundedPreceding, -1)
    val thresholds = gmax.withColumn("__maxy_gt", max(col("__gy")).over(wd))
    local.join(thresholds, Seq(xCol))
      .filter((col("__maxy_gt").isNull || col("__maxy_gt") < col(yCol)) &&
        col("__gy") === col(yCol))
      .drop("__gy", "__maxy_gt")
  }
}
