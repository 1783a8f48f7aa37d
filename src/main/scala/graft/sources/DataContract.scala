package graft.sources

import org.apache.spark.sql.SparkSession
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
        }.flatten
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
