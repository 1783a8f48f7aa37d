package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Q
import graft.sources.Tables

/** SQL-text surface (spark.sql over registered views) and non-parquet
  * source formats (CSV/JSON round-trips through explicit schemas).
  */
object SqlAndSources {

  /** Full SQL text through the parser/analyzer/optimizer — TPC-H Q3
    * shape (3-way join, filter, agg, top-k).
    */
  private val q90SqlTpchQ3: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin)
  }

  /** CSV sink + source round-trip: nation → CSV (header) → typed read
    * with explicit schema → join/agg. Values are integers/strings, so
    * the trip is lossless and the oracle can use the original parquet.
    */
  private val q91CsvRoundtrip: Q = (s, d) => {
    val tmp = s"/tmp/graft_csv_nation_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    Tables.nation(s, d).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val back = s.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("header", "true").csv(tmp)
    back.join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_nation"))
      .orderBy("r_name")
  }

  /** JSON lines sink + source round-trip over supplier. */
  private val q92JsonRoundtrip: Q = (s, d) => {
    val tmp = s"/tmp/graft_json_supplier_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    Tables.supplier(s, d).coalesce(1).write.mode("overwrite").json(tmp)
    s.read
      .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
      .json(tmp)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"),
        graft.functions.GraftFunctions.dsum(col("s_acctbal")).as("sum_bal"))
      .orderBy("s_nationkey")
  }

  /** from_json struct extraction + regexp_extract_all arrays. */
  private val q49JsonRegex: Q = (s, d) => {
    Tables.events(s, d)
      .filter(col("event_id") < 500)
      .select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").cast(LongType).as("k"),
        // serialized to CSV: array-typed output cells crash the driver's
        // pandas row-sort canonicalizer (unhashable ndarray)
        concat_ws(",", regexp_extract_all(col("props"), lit("[0-9]+"), lit(0))).as("digits"))
      .orderBy("event_id")
  }

  /** Correlated scalar subquery — Catalyst decorrelates it into an
    * aggregate + join (no per-row re-execution, unlike the naive plan).
    */
  private val q93SqlCorrelated: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.8 * (
        |  SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** TPC-H Q22 shape: uncorrelated scalar subquery + NOT EXISTS anti
    * join + aggregation.
    */
  private val q94SqlQ22Shape: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** TPC-H Q15 shape: CTE revenue view + max scalar subquery. */
  private val q95SqlQ15Shape: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total = (SELECT max(total) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  val defs: Map[String, Q] = Map(
    "q90_sql_tpch_q3" -> q90SqlTpchQ3,
    "q93_sql_correlated_subquery" -> q93SqlCorrelated,
    "q94_sql_q22_shape" -> q94SqlQ22Shape,
    "q95_sql_q15_shape" -> q95SqlQ15Shape,
    "q91_csv_roundtrip" -> q91CsvRoundtrip,
    "q92_json_roundtrip" -> q92JsonRoundtrip,
    "q49_json_regex" -> q49JsonRegex)

  val oracles: Map[String, String] = Map(
    "q94_sql_q22_shape" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q95_sql_q15_shape" ->
      """WITH revenue AS (
        |  SELECT l_suppkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total = (SELECT max(total) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q93_sql_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.8 * (
        |  SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q90_sql_tpch_q3" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q91_csv_roundtrip" ->
      """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q92_json_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q49_json_regex" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS digits
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin)
}
