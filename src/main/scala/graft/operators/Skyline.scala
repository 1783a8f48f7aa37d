package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed skyline (Pareto front), maximizing every dimension.
  *
  * The skyline operator is distributive: skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B)). Phase 1 therefore computes each
  * partition's local skyline in a JVM kernel (sort-filter skyline:
  * lexicographic descending sort, keep rows no kept row dominates —
  * O(p·s·d) per partition, no shuffle), discarding everything dominated
  * locally; the survivors are spilled ONCE (both phase-2 consumers read
  * the spill, so the expensive phase-1 scan never re-executes). Phase 2
  * runs the exact dominance test over the (small) union of survivors.
  * At 100 TB phase 1 does all the data reduction scan-side; phase 2
  * sees only per-partition fronts (bounded by the fronts' sizes,
  * typically tiny).
  *
  * Dominance: q dominates p iff q ≥ p on every dimension and q > p on
  * at least one. Duplicate points on the front all survive.
  */
object Skyline {

  /** Sort-filter skyline over one in-memory batch: sort lexicographic
    * descending on the dims, then keep each row not dominated by an
    * already-kept row. Correct because in descending lexicographic
    * order a later row can never dominate an earlier one (its first
    * differing dim is strictly smaller; full ties have no strict dim).
    */
  private def localFront(rows: Array[Row], idx: Array[Int]): Iterator[Row] = {
    if (rows.length <= 1) rows.iterator
    else {
      val d = idx.length
      def dim(r: Row, j: Int): Long = r.get(idx(j)) match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"skyline dimension must be int/long, got $other")
      }
      val ord = new Ordering[Row] {
        def compare(a: Row, b: Row): Int = {
          var j = 0
          while (j < d) {
            val c = java.lang.Long.compare(dim(b, j), dim(a, j)) // descending
            if (c != 0) return c
            j += 1
          }
          0
        }
      }
      val sorted = rows.sorted(ord)
      val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var i = 0
      while (i < sorted.length) {
        val r = sorted(i)
        val v = Array.tabulate(d)(j => dim(r, j))
        var dominated = false
        var k = 0
        while (k < kept.length && !dominated) {
          val q = kept(k)
          var allGe = true
          var strict = false
          var j = 0
          while (j < d && allGe) {
            if (q(j) < v(j)) allGe = false
            else if (q(j) > v(j)) strict = true
            j += 1
          }
          dominated = allGe && strict
          k += 1
        }
        if (!dominated) { out += r; kept += v }
        i += 1
      }
      out.iterator
    }
  }

  /** Rows of `df` not dominated on `dims` (all maximized, any d ≥ 2).
    * Integer/long dimensions; output keeps all original columns.
    * Phase 2 is the same kernel over the coalesced survivor spill —
    * exact, and single-task only over the already-reduced front union.
    */
  def skyline(df: DataFrame, dims: String*): DataFrame = {
    require(dims.size >= 2, "skyline needs at least 2 dimensions")
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex).toArray
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val local = df.mapPartitions(it => localFront(it.toArray, idx))(enc)
    val survivors = Materialize.spillRelease(local)
    survivors.coalesce(1).mapPartitions(it => localFront(it.toArray, idx))(enc)
  }

  /** 2D special case: phase 2 stays fully parallel — max(y) per
    * distinct x, then an exclusive prefix max over x descending built
    * on [[Ranking.prefixMaxExclusiveDesc]]'s range-bucketed machinery
    * (per-bucket windows plus a |buckets|-row carry-in collect). Never
    * a self-join, shrinking frame, or single-task pass — including on
    * anti-correlated data where EVERY row survives the local fronts
    * and the distinct-x union is as large as the input.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val schema = df.schema
    val idx = Array(schema.fieldIndex(xCol), schema.fieldIndex(yCol))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // spill phase 1 once: gmax and the final join both read the spill,
    // not the (expensive) partition-scan kernel
    val local = Materialize.spillRelease(
      df.mapPartitions(it => localFront(it.toArray, idx))(enc))
    val gmax = local.groupBy(col(xCol)).agg(max(col(yCol)).as("__gy"))
    val thresholds = Ranking.prefixMaxExclusiveDesc(gmax, xCol, "__gy", "__maxy_gt")
    local.join(thresholds, Seq(xCol))
      .filter((col("__maxy_gt").isNull || col("__maxy_gt") < col(yCol)) &&
        col("__gy") === col(yCol))
      .drop("__gy", "__maxy_gt")
  }
}
