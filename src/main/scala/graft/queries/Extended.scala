package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.GraftRegistry
import graft.operators.Multimodal
import graft.sources.Tables

/** Queries exercising the engine-extension surface: the native
  * LogitExpr/UDAF registrations and the multimodal binary-column
  * pipeline.
  */
object Extended {

  /** Typed-Aggregator UDAF (geometric mean) next to stock aggregates. */
  private val q33Geomean: Q = (s, d) => {
    GraftRegistry.register(s)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("graft_geomean(l_extendedprice)").as("geo_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Native codegen'd logit expression through the SQL registry. */
  private val q34NativeLogit: Q = (s, d) => {
    GraftRegistry.register(s)
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(expr("graft_logit(l_discount + 0.05)"), 6).as("logit_disc"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Multimodal pipeline: binary payload + metadata struct → typed
    * partition-wise decode → per-item features (see operators.Multimodal;
    * decode itself is a deterministic stub, the plumbing is real).
    */
  private val q35Multimodal: Q = (s, d) => {
    val feats = Multimodal.decodeFeatures(
      Multimodal.mediaFromDocuments(Tables.documents(s, d)))
    feats.toDF()
      .select(
        col("id"), col("source"),
        col("nBytes").as("n_bytes"),
        col("checksum"),
        col("frameHex").as("frame_hex"),
        col("width"), col("height"))
      .orderBy("id")
  }

  /** Custom Generator (UDTF) through the SQL surface: text → shingle
    * rows → top-15 histogram.
    */
  private val q36CustomGenerator: Q = (s, d) => {
    GraftRegistry.register(s)
    Tables.documents(s, d).createOrReplaceTempView("documents_v")
    s.sql(
      """SELECT shingle, count(*) AS n FROM (
        |  SELECT explode_shingles(text, 3) AS shingle FROM documents_v)
        |GROUP BY shingle ORDER BY n DESC, shingle ASC LIMIT 15""".stripMargin)
  }

  val defs: Map[String, Q] = Map(
    "q33_udaf_geomean" -> q33Geomean,
    "q36_custom_generator" -> q36CustomGenerator,
    "q34_native_logit" -> q34NativeLogit,
    "q35_multimodal_decode" -> q35Multimodal)

  val oracles: Map[String, String] = Map(
    "q36_custom_generator" ->
      """WITH t AS (SELECT str_split(text, ' ') w FROM documents),
        |sh AS (SELECT unnest([array_to_string(w[i:i+2], ' ')
        |    for i in range(1, greatest(len(w) - 2, 1) + 1)]) AS shingle FROM t)
        |SELECT shingle, count(*) AS n FROM sh
        |GROUP BY shingle ORDER BY n DESC, shingle ASC LIMIT 15""".stripMargin,
    "q33_udaf_geomean" ->
      """SELECT l_returnflag, exp(avg(ln(l_extendedprice))) AS geo_price, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q34_native_logit" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(ln((l_discount + 0.05) / (1.0 - (l_discount + 0.05))), 6) AS logit_disc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q35_multimodal_decode" ->
      """SELECT doc_id AS id, source,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  ('0x' || substr(md5(text), 1, 15))::BIGINT AS checksum,
        |  upper(hex(encode(substr(text, 1, 16)))) AS frame_hex,
        |  ((doc_id % 8) * 160 + 320)::INT AS width,
        |  ((doc_id % 8) * 90 + 180)::INT AS height
        |FROM documents ORDER BY id""".stripMargin)
}
