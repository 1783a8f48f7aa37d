package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global sequence numbers (dense 1..n over a total order)
  * without the single-partition window that a bare
  * `row_number() OVER (ORDER BY ...)` plans to.
  *
  * Shape: range-repartition on the sort key (the same distributed-sort
  * machinery as `orderBy`), spill the bucketed rows once so every
  * downstream job sees identical buckets (range boundaries are SAMPLED
  * per action, so two jobs over an unspilled repartitionByRange could
  * disagree about bucket membership), then a per-bucket `row_number`
  * (a window keyed by the bucket id — fully parallel) plus each
  * bucket's global offset from a |buckets|-row count collect (bounded
  * driver metadata, the zipWithIndex contract). The resulting rank
  * depends only on the total order, never on where the sampled
  * boundaries fall.
  *
  * At 100 TB this is the standard terasort ending: one sorted
  * materialization pass (usually the very output being produced) and a
  * metadata-sized offset exchange.
  */
private[graft] object Ranking {

  /** Append a dense global rank column named `rankName`, ranked by
    * `order` (which must be a total order — add a unique tiebreaker).
    */
  def globalRank(df: DataFrame, rankName: String, order: Column*): DataFrame =
    globalRankCounted(df, rankName, order: _*)._1

  /** globalRank plus the TOTAL row count, which the machinery already
    * collects as the |buckets|-row offset metadata — callers that need
    * n (median picks, percentile ranks) otherwise pay one more full
    * pass over the ranked spill just to count it.
    */
  def globalRankCounted(df: DataFrame, rankName: String,
      order: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = math.max(2, spark.sessionState.conf.numShufflePartitions / 2)
    val bucketed = Materialize.spillRelease(
      df.repartitionByRange(parts, order: _*)
        .withColumn("__bkt", spark_partition_id()))
    val counts = bucketed.groupBy("__bkt").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = (b, acc); acc += c; o }
    val offDf = offsets.toSeq.toDF("__bkt", "__off")
    val w = Window.partitionBy(col("__bkt")).orderBy(order: _*)
    val ranked = bucketed.withColumn("__lrn", row_number().over(w))
      .join(broadcast(offDf), "__bkt")
      .withColumn(rankName, col("__off") + col("__lrn"))
      .drop("__bkt", "__lrn", "__off")
    (ranked, acc)
  }

  /** Append `outName` = max of `valCol` over all rows with a STRICTLY
    * larger `keyCol` (exclusive prefix max in key-descending order;
    * null when no larger key exists). Keys must be distinct (the
    * caller's frame is a groupBy(key) result) and int/long-valued.
    *
    * Same machinery as [[globalRank]]: range-repartition on key desc,
    * spill once so every downstream job sees identical buckets, then a
    * per-bucket running max (window keyed by bucket id — fully
    * parallel) combined with each bucket's carry-in: the running max of
    * all EARLIER buckets, from a |buckets|-row collect (bounded driver
    * metadata). No single-task pass at any width — the r9 verdict's
    * skyline2d item.
    */
  def prefixMaxExclusiveDesc(df: DataFrame, keyCol: String, valCol: String,
      outName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = math.max(2, spark.sessionState.conf.numShufflePartitions / 2)
    val bucketed = Materialize.spillRelease(
      df.repartitionByRange(parts, col(keyCol).desc)
        .withColumn("__bkt", spark_partition_id()))
    // bucket carry-ins: max(val) per bucket, exclusive-scanned on the
    // driver in bucket order (bucket 0 holds the largest keys)
    val maxes = bucketed.groupBy("__bkt")
      .agg(max(col(valCol).cast("long")).as("m"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    var carry: Option[Long] = None
    val carries = maxes.map { case (b, m) =>
      val row = (b, carry)
      carry = (carry.toSeq ++ m.toSeq).reduceOption((a: Long, b: Long) => math.max(a, b))
      row
    }
    val carryDf = carries.toSeq.toDF("__bkt", "__carry")
    val w = Window.partitionBy(col("__bkt")).orderBy(col(keyCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("__run", max(col(valCol).cast("long")).over(w))
      .join(broadcast(carryDf), "__bkt")
      // greatest() skips nulls: null only when BOTH carry and running max are absent
      .withColumn(outName, greatest(col("__run"), col("__carry")))
      .drop("__bkt", "__run", "__carry")
  }
}
