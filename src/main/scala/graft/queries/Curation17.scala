package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Q
import graft.sources.Tables

/** Round-6 wave 5: 2D skyline (Pareto front) and Spearman rank
  * correlation.
  */
object Curation17 {

  /** 2D skyline / Pareto front over documents maximizing (length,
    * vocabulary): a doc survives iff no other doc dominates it
    * (≥ in both dimensions, > in one). With integer dimensions the
    * dominance test is two window aggregates — max(y) over STRICTLY
    * larger x (integer RANGE frame) and max(y) within the same x —
    * so the whole operator is one sort, no self-join, no quadratic
    * pair scan. At cluster scale the standard two-phase variant
    * applies: per-partition skyline first (the skyline operator is
    * idempotent and distributive), then this pass over the small
    * union of survivors.
    */
  private val q248Skyline2d: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      col("n_chars").as("x"),
      size(array_distinct(split(col("text"), " "))).cast(LongType).as("y"))
    // Dominance thresholds per DISTINCT x, not per row: max(y) within
    // each x group, then a PREFIX running max over x descending gives
    // "best y among strictly larger x". A prefix frame is computed
    // incrementally (O(distinct x)); the direct formulation — max(y)
    // OVER (RANGE 1 FOLLOWING..UNBOUNDED) — is a shrinking frame Spark
    // must rescan per row: measured O(n²), 8.7 s at sf1 vs 0.5 s for
    // this shape.
    val gmax = docs.groupBy("x").agg(max(col("y")).as("gy"))
    val wd = Window.orderBy(col("x").desc).rowsBetween(Window.unboundedPreceding, -1)
    val thresholds = gmax.withColumn("maxy_gt", max(col("gy")).over(wd))
    docs.join(thresholds, Seq("x"))
      .filter((col("maxy_gt").isNull || col("maxy_gt") < col("y")) &&
        col("gy") === col("y"))
      .select(col("doc_id"), col("x"), col("y"))
      .orderBy(col("x").desc, col("doc_id"))
  }

  /** Spearman rank correlation between document length and vocabulary
    * size. Average-rank ties are computed over DISTINCT values (the
    * Mann-Whitney machinery), joined back, and all five moment sums
    * accumulate as DECIMAL over exact half-integer ranks — the
    * coefficient is engine-exact up to the final division. One keyed
    * aggregate + two bounded distinct-value windows.
    */
  private val q249Spearman: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      col("n_chars").cast(LongType).as("xv"),
      size(array_distinct(split(col("text"), " "))).cast(LongType).as("yv"))
    def avgRanks(colName: String, out: String): org.apache.spark.sql.DataFrame = {
      val byv = docs.groupBy(col(colName)).agg(count(lit(1)).as("tv"))
      val wb = Window.orderBy(colName).rowsBetween(Window.unboundedPreceding, -1)
      byv.withColumn("cum", coalesce(sum(col("tv")).over(wb), lit(0L)))
        .select(col(colName),
          (col("cum").cast(DoubleType) + (col("tv").cast(DoubleType) + 1.0) / 2.0)
            .cast(DecimalType(20, 1)).as(out))
    }
    val ranked = docs
      .join(avgRanks("xv", "rx"), Seq("xv"))
      .join(avgRanks("yv", "ry"), Seq("yv"))
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("rx")).as("sxx"), sum(col("ry") * col("ry")).as("syy"),
      sum(col("rx") * col("ry")).as("sxy"))
    m.select(col("n"),
      round((col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
        col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
        sqrt((col("n").cast(DoubleType) * col("sxx").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
          (col("n").cast(DoubleType) * col("syy").cast(DoubleType) -
            col("sy").cast(DoubleType) * col("sy").cast(DoubleType))), 6).as("spearman"))
  }

  val defs: Map[String, Q] = Map(
    "q248_skyline_2d" -> q248Skyline2d,
    "q249_spearman" -> q249Spearman)

  val oracles: Map[String, String] = Map(
    "q248_skyline_2d" ->
      """WITH docs AS (SELECT doc_id, n_chars x,
        |    len(list_distinct(str_split(text, ' '))) y FROM documents),
        |marked AS (SELECT *,
        |    max(y) OVER (ORDER BY x RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) maxy_gt,
        |    max(y) OVER (PARTITION BY x) maxy_eq
        |  FROM docs)
        |SELECT doc_id, x::BIGINT AS x, y::BIGINT AS y FROM marked
        |WHERE (maxy_gt IS NULL OR maxy_gt < y) AND maxy_eq = y
        |ORDER BY x DESC, doc_id""".stripMargin,
    "q249_spearman" ->
      """WITH docs AS (SELECT doc_id, n_chars xv,
        |    len(list_distinct(str_split(text, ' '))) yv FROM documents),
        |rxs AS (SELECT xv, CAST(coalesce(sum(tv) OVER (ORDER BY xv
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::DOUBLE
        |    + (tv::DOUBLE + 1.0) / 2.0 AS DECIMAL(20,1)) rx
        |  FROM (SELECT xv, count(*) tv FROM docs GROUP BY xv)),
        |rys AS (SELECT yv, CAST(coalesce(sum(tv) OVER (ORDER BY yv
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::DOUBLE
        |    + (tv::DOUBLE + 1.0) / 2.0 AS DECIMAL(20,1)) ry
        |  FROM (SELECT yv, count(*) tv FROM docs GROUP BY yv)),
        |ranked AS (SELECT rx, ry FROM docs JOIN rxs USING (xv) JOIN rys USING (yv)),
        |m AS (SELECT count(*) n, sum(rx) sx, sum(ry) sy,
        |    sum(rx * rx) sxx, sum(ry * ry) syy, sum(rx * ry) sxy FROM ranked)
        |SELECT n::BIGINT AS n,
        |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |    sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
        |      (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6) AS spearman
        |FROM m""".stripMargin)
}
