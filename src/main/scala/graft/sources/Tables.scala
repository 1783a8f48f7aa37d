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
    * measured cold-session tax. The schema of a harness table is
    * immutable for the life of the JVM (same contract as the per-JVM
    * fixture dirs), so later sessions read with an explicit schema:
    * zero inference I/O. Bounded driver state: one StructType per
    * table path.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a nanos long and floor to micros
    * (TimestampType). The harness data is µs-aligned so this is lossless.
    * Integer DIV, not `/`: epoch-nanos (~1.7e18) exceeds double's exact
    * integer range.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
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
        // events MUST go through its typed reader: the raw reader fails
        // schema inference on TIMESTAMP(NANOS) unless the session conf is
        // already set — which previously only happened if an
        // events-reading query ran first (order-dependent flakiness)
        val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
        df.createOrReplaceTempView(n)
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
