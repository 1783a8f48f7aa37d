package graft.sources

import org.apache.spark.sql.SparkSession

/** Bucketed-table materialization: the shuffle-elimination layout for
  * repeated large-to-large joins.
  *
  * At 100 TB the dominant cost of `lineitem ⋈ orders` is shuffling both
  * sides on the join key — every repetition of the join pays it again.
  * Writing both tables bucketed (and sorted) by the key into `numBuckets`
  * files per table makes the join key a *storage* property: Spark's scan
  * reports `HashPartitioning(key, numBuckets)` as its output
  * partitioning, the planner sees both sides already co-partitioned and
  * co-sorted, and SortMergeJoin runs with **zero Exchange and zero
  * Sort** — a pure per-bucket streaming merge. Pay the shuffle once at
  * layout time, amortize it over every subsequent join/aggregation on
  * the key (PlanQualitySpec pins the no-Exchange plan shape).
  *
  * The reference is an eager single-node engine with no layout concept
  * (/root/reference/axolotls/dataframe.py — in-memory columns); this is
  * the Spark-native answer to "how does the same join stay fast when the
  * table stops fitting in memory".
  */
object Bucketing {

  val Buckets = 8

  /** Table names are keyed by the scale-factor dir (sf0.01 →
    * `orders_b8_sf0_01_<h>`), so different-sf JVMs sharing the
    * warehouse path never clobber each other's layout, and a catalog
    * probe for THIS dir's table is meaningful after a context restart.
    * `<h>` is a short hash of the FULL canonical path — two dirs with
    * the same leaf name under different parents get distinct tables.
    */
  def ordersTable(dir: String): String = s"orders_b8_${suffix(dir)}"
  def lineitemTable(dir: String): String = s"lineitem_b8_${suffix(dir)}"
  private def suffix(dir: String): String = {
    val f = new java.io.File(dir)
    val h = Integer.toHexString(f.getCanonicalPath.hashCode & 0xffffff)
    f.getName.replaceAll("[^A-Za-z0-9]", "_") + "_" + h
  }

  /** Dirs whose tables are currently materialized (JVM-wide; the
    * catalog entries live in the SparkContext-shared external catalog,
    * so a marker alone is insufficient after a context restart —
    * [[ensure]] re-checks `tableExists`).
    */
  @volatile private var builtFor: Set[String] = Set.empty

  /** Materialize the bucketed orders/lineitem tables for `dir`,
    * bucketed+sorted by order key, if not already present. Idempotent
    * per (JVM, dir); `saveAsTable` goes to the session catalog's
    * warehouse (the managed path — CTAS with `bucketBy` requires a
    * table, not a bare path).
    */
  /** The two planner flags the bucketed layout relies on, applied at
    * SESSION BUILD time (Bench/Verify/SparkSpec), not mutated here —
    * materializing a layout must not silently change planner behavior
    * for unrelated queries later in a foreign session.
    *
    * - sort-aware bucketed scans are behind a default-off flag since
    *   Spark 3.1 (the planner otherwise re-sorts pre-sorted buckets);
    *   safe for this writer because it guarantees exactly one sorted
    *   file per bucket (see repartition note in [[ensure]])
    * - DisableUnnecessaryBucketedScan would turn the bucketed scan off
    *   for non-join queries, forfeiting bucket-filter pruning (point
    *   lookups reading 1/numBuckets of the files)
    *
    * Without these flags the bucketed queries stay CORRECT — the
    * planner just re-inserts a Sort / plain scan — so a session that
    * misses them degrades gracefully.
    */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true",
    "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false")

  def ensure(spark: SparkSession, dir: String): Unit = synchronized {
    val (ot, lt) = (ordersTable(dir), lineitemTable(dir))
    val present = builtFor.contains(dir) &&
      spark.catalog.tableExists(ot) && spark.catalog.tableExists(lt)
    if (!present) {
      // a previous JVM's managed-table dirs survive in the warehouse
      // while the in-memory catalog starts empty — clear stale paths
      // or CTAS fails with LOCATION_ALREADY_EXISTS
      val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(ot, lt).foreach { t =>
        if (!spark.catalog.tableExists(t))
          fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
      }
      // repartition on the bucket key first: repartition's hash ==
      // the bucket-id hash, so every write task holds exactly one
      // bucket and emits ONE file per bucket — the single-file-per-
      // bucket layout is what lets the scan expose its sort order and
      // the join skip the Sort as well as the Exchange
      import org.apache.spark.sql.functions.col
      Tables.orders(spark, dir).repartition(Buckets, col("o_orderkey")).write
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").format("parquet").saveAsTable(ot)
      Tables.lineitem(spark, dir).repartition(Buckets, col("l_orderkey")).write
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").format("parquet").saveAsTable(lt)
      builtFor += dir
    }
  }
}
