package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * One parquet file per table under the scale-factor dir. All reads go
  * through [[table]] so scan options (vectorized reader, pushdown) stay
  * centralized. At cluster scale these would be partitioned directories;
  * the API is path-based so nothing changes for the caller.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** JVM-wide (path → schema) memo: parquet schema inference reads
    * file footers and runs once per (session, table) — a fresh session
    * (Bench isolation mode, a new SQL client) re-paid it for all 10
    * tables before its first query could plan, the bulk of the
    * measured cold-session tax. Later sessions read with an explicit
    * schema: zero inference I/O. Bounded driver state: one entry per
    * table path.
    *
    * Entries are validated against the file's (mtime, size) on every
    * lookup — a harness data regen mid-JVM (observed: round 5, where a
    * regenerated events.parquet changed ts from TIMESTAMP(NANOS) to
    * timestamp[us]) must not serve a stale StructType. A filesystem
    * stat is ~µs vs ~100ms footer inference, so validation keeps the
    * win. Paths that aren't local files (hdfs://, s3://) skip
    * validation and can be evicted explicitly via [[invalidate]].
    */
  private final case class SchemaEntry(mtime: Long, size: Long,
      schema: org.apache.spark.sql.types.StructType)
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, SchemaEntry]()

  private def statLocal(path: String): (Long, Long) = {
    val f = new java.io.File(path)
    if (f.exists()) (f.lastModified(), f.length()) else (-1L, -1L)
  }

  /** Drop a cached schema (e.g. after a read/analysis failure). */
  def invalidate(path: String): Unit = schemaCache.remove(path)

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val (m, sz) = statLocal(path)
    val cached = schemaCache.get(path)
    if (cached != null && cached.mtime == m && cached.size == sz)
      spark.read.schema(cached.schema).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, SchemaEntry(m, sz, df.schema))
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** Schema-adaptive events reader. Harness regens have shipped
    * events.ts in two physical vintages:
    *   - parquet TIMESTAMP(NANOS) (rounds 1–4): Spark's vectorized
    *     reader rejects it; load as a nanos long (legacy conf) and
    *     floor to micros. Integer DIV, not `/`: epoch-nanos (~1.7e18)
    *     exceeds double's exact integer range.
    *   - plain timestamp[us] (round 5+): loads as TIMESTAMP_NTZ; cast
    *     to TimestampType (identity on the wall clock under the UTC
    *     session tz all entry points set).
    * Branch on the LOADED type so either vintage yields the same UTC
    * TimestampType column — hardcoding one vintage broke 54 queries in
    * round 5 when the harness regenerated the files mid-build.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // harmless when the file is already timestamp[us]; required to even
    // infer a schema when it is TIMESTAMP(NANOS)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to UTC TimestampType regardless of
    * the physical vintage it loaded as (see [[events]]). Shared with the
    * streaming file source (graft.streaming.StreamingOps.readEventStream).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df // already TimestampType
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Session-conf key recording which dir's views are registered. Using a
    * conf (not a driver-side map) keeps the marker scoped to the session
    * it describes — a new session starts unregistered automatically.
    */
  private val RegisteredDirKey = "spark.graft.tables.registeredDir"

  /** Register all tables as temp views (for SQL-surface queries).
    *
    * Idempotent per (session, dir): re-registering replaces all 10 temp
    * views (invalidating any cached plans on them) and re-triggers parquet
    * schema inference — ~1s warm / ~4s cold — so every SQL-surface query
    * paying that per call was the dominant suite-wide SQL overhead. A
    * repeat call for the same dir is now a conf read + one catalog probe.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val fresh = spark.conf.getOption(RegisteredDirKey).contains(dir) &&
      spark.catalog.tableExists("lineitem")
    if (!fresh) {
      names.foreach { n =>
        // Per-table failure isolation: one unreadable table must not kill
        // the other nine views (round 5: a broken events reader took down
        // every pure-lineitem TPC-H shape with it). On failure, evict the
        // possibly-stale cached schema and retry once; if it still fails,
        // surface the error and move on.
        def register(): Unit = {
          // events MUST go through its typed reader: the raw reader fails
          // schema inference on TIMESTAMP(NANOS) unless the session conf
          // is already set — which previously only happened if an
          // events-reading query ran first (order-dependent flakiness)
          val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
          df.createOrReplaceTempView(n)
        }
        try register()
        catch { case _: Exception =>
          invalidate(s"$dir/$n.parquet")
          try register()
          catch { case e2: Exception =>
            System.err.println(
              s"[tables] failed to register view '$n' ($dir): ${e2.getMessage}")
          }
        }
      }
      spark.conf.set(RegisteredDirKey, dir)
    }
  }

  /** Drop the registered views and clear the marker — for callers that
    * deliberately reset session state (e.g. Bench isolation mode).
    */
  def unregisterAll(spark: SparkSession): Unit = {
    names.foreach(n => spark.catalog.dropTempView(n))
    spark.conf.unset(RegisteredDirKey)
  }
}
