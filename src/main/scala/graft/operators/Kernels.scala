package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy per-row kernels.
  *
  * Scan parallelism is decided by file layout (file count, row-group
  * boundaries): a corpus that arrives as a few large single-row-group
  * files is scanned as a few tasks, and any expensive kernel fused
  * into that scan stage (MinHash signatures: |shingles|·numHashes
  * md5 + min loops per doc) inherits that — one straggler task doing
  * all the CPU work while the rest of the cluster idles. The fix is
  * the standard one for compute-bound stages behind coarse inputs:
  * one explicit round-robin repartition of the (slim, pre-projected)
  * kernel input, decoupling kernel parallelism from input layout.
  * The exchange moves one pass of the projected columns; the kernel
  * gains full-cluster parallelism — a trade that wins whenever the
  * kernel is more expensive than a row re-shuffle, which is the
  * definition of the kernels this guards.
  *
  * Inputs that are already at least as parallel as the target are
  * passed through untouched — on a well-laid-out 100 TB corpus
  * (thousands of parquet splits) this is a no-op and no exchange is
  * added. Target = `spark.graft.kernel.minPartitions` when set
  * (0 disables), else the cluster's default parallelism.
  */
private[graft] object Kernels {

  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.conf.getOption("spark.graft.kernel.minPartitions") match {
      case Some(s) => s.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"spark.graft.kernel.minPartitions must be an integer, got '$s'"))
      case None => spark.sparkContext.defaultParallelism
    }
    if (target <= 0) df
    // planning the (scan + projection) subtree to read its partition
    // count is cheap; no job runs
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
