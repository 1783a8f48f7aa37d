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

  /** Compact a small-file parquet directory to ~`targetBytes` files.
    *
    * Streaming sinks and per-batch upserts accrete files; at 100 TB a
    * million 1 MB files turn every scan into a listing+open storm and
    * starve the scheduler with micro-tasks. Standard maintenance pass:
    * size the output file count from the CURRENT on-disk bytes (a
    * FileSystem listing — no data read), rewrite once, swap. Returns
    * the new file count. Coalesce, not repartition: no shuffle — each
    * output task concatenates input splits.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compacting")
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: the rewritten copy replaces the original atomically-enough
    // for a maintenance window (a real lakehouse would commit via its
    // table format's metadata transaction instead)
    fs.delete(path, true)
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"compact: rename $tmp -> $path failed")
    fs.listStatus(path).count(f => f.getPath.getName.endsWith(".parquet")).toLong
  }
}
