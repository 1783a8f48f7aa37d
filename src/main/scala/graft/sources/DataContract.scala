package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-contract canary for the harness tables.
  *
  * The harness owns the parquet fixtures and has regenerated them
  * mid-build with changed physical types (round 5: events.ts went from
  * TIMESTAMP(NANOS) to timestamp[us], breaking a reader that had baked
  * in the old vintage). This canary runs FIRST in Verify/Bench: it
  * loads every table through the same readers the queries use and
  * checks the columns each operator family keys on, producing one
  * named diagnosis per violation instead of dozens of identical
  * stack traces downstream.
  *
  * Never throws — a broken table yields a `FAIL table: reason` line and
  * the caller decides what to do (queries on other tables still run
  * because Tables.registerAll is failure-isolated).
  */
object DataContract {

  /** (table, column, acceptable logical types after the reader ran). */
  private val expectations: Seq[(String, String, Set[DataType])] = {
    val ints: Set[DataType] = Set(IntegerType, LongType)
    Seq(
      ("region", "r_regionkey", ints),
      ("nation", "n_nationkey", ints),
      ("customer", "c_custkey", ints),
      ("supplier", "s_suppkey", ints),
      ("part", "p_partkey", ints),
      ("orders", "o_orderkey", ints),
      ("orders", "o_orderdate", Set(TimestampType, TimestampNTZType, DateType)),
      ("lineitem", "l_orderkey", ints),
      ("lineitem", "l_shipdate", Set(TimestampType, TimestampNTZType, DateType)),
      // events.ts must come out of the adaptive reader as a true
      // timestamp — the exact contract round 5 broke
      ("events", "ts", Set(TimestampType)),
      ("events", "event_id", ints),
      ("documents", "doc_id", ints),
      ("documents", "text", Set(StringType)),
      ("embeddings", "vec_id", ints),
      ("embeddings", "embedding", Set(ArrayType(FloatType, true),
        ArrayType(FloatType, false), ArrayType(DoubleType, true),
        ArrayType(DoubleType, false)))
    )
  }

  /** Value-level probes over a bounded sample (limit pushes to the
    * scan): the columns every text/vector operator keys on must not
    * just have the right logical type but also usable VALUES — a regen
    * that shipped null/empty text or ragged embedding arrays would
    * pass the type check and then fail fifty queries identically.
    * One named diagnosis per violation, same discipline as the types.
    */
  private def valueViolations(
      name: String, df: org.apache.spark.sql.DataFrame): Seq[String] = name match {
    case "documents" if df.columns.contains("text") =>
      val r = df.select(col("text")).limit(1000)
        .agg(count(lit(1)).as("n"),
          sum(when(col("text").isNull || length(col("text")) === 0, 1L)
            .otherwise(0L)).as("bad"))
        .head()
      if (r.getLong(0) == 0L) Seq("text sample is EMPTY (0 rows)")
      else if (r.getLong(1) > 0L)
        Seq(s"text has ${r.getLong(1)}/${r.getLong(0)} null/empty values in sample")
      else Nil
    case "embeddings" if df.columns.contains("embedding") =>
      // null arrays map to size -1 so min() can never be null on a
      // non-empty sample (a getInt on null would crash the canary itself)
      val r = df.select(coalesce(size(col("embedding")), lit(-1)).as("sz")).limit(1000)
        .agg(count(lit(1)).as("n"), countDistinct(col("sz")).as("dims"),
          min(col("sz")).as("mn"))
        .head()
      if (r.getLong(0) == 0L) Seq("embedding sample is EMPTY (0 rows)")
      else {
        val ragged = if (r.getLong(1) != 1L)
          Seq(s"embedding has ${r.getLong(1)} distinct lengths in sample (ragged)")
        else Nil
        val degenerate = if (r.getInt(2) <= 0)
          Seq(s"embedding has empty/null arrays in sample (min size ${r.getInt(2)})")
        else Nil
        ragged ++ degenerate
      }
    case _ => Nil
  }

  /** One line per table: `OK name (col:type, …)` or `FAIL name: reason`. */
  def report(spark: SparkSession, dir: String): Seq[String] =
    Tables.names.map { name =>
      try {
        val df =
          if (name == "events") Tables.events(spark, dir)
          else Tables.table(spark, dir, name)
        val schema = df.schema
        val violations = expectations.collect {
          case (t, col, ok) if t == name =>
            schema.fields.find(_.name == col) match {
              case None => Some(s"$col MISSING")
              case Some(f) if !ok.contains(f.dataType) =>
                Some(s"$col is ${f.dataType.simpleString}, expected one of " +
                  ok.map(_.simpleString).mkString("{", ",", "}"))
              case _ => None
            }
        }.flatten ++ valueViolations(name, df)
        if (violations.isEmpty)
          s"OK   $name (" + schema.fields.map(f =>
            s"${f.name}:${f.dataType.simpleString}").mkString(", ") + ")"
        else s"FAIL $name: " + violations.mkString("; ")
      } catch {
        case e: Exception =>
          s"FAIL $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
      }
    }

  /** True iff every table passes — cheap gate for callers that want it. */
  def ok(spark: SparkSession, dir: String): Boolean =
    report(spark, dir).forall(_.startsWith("OK"))
}
