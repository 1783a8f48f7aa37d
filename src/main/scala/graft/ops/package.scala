package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** The reference's user-facing verbs as idiomatic Spark syntax — a thin
  * façade over Column/DataFrame (SURVEY.md §7 design), NOT a
  * reimplementation of columns. Each verb cites the reference behavior
  * it mirrors; all of them compile to stock Catalyst expressions.
  *
  * {{{
  * import graft.ops._
  * df.withColumn("dense1", ($"dense1".fillNull(0) + 3).ln)
  *   .withColumn("p", (lit(1.0) / ($"dense3".fillNull(0) + 3)).logit)
  * }}}
  */
package object ops {

  implicit class GraftColumnOps(private val c: Column) extends AnyVal {

    /** fill_null: replace NULL with scalar (numeric_column.py:56-73). */
    def fillNull(v: Any): Column = coalesce(c, lit(v))

    /** natural log, torch-eager chain style (numeric_column.py:112-116). */
    def ln: Column = F.log(c)

    /** logit(p) = ln(p/(1-p)) (numeric_column.py:118-125). */
    def logit: Column = graft.functions.GraftFunctions.logit(c)

    /** logit with eps clamping (numeric_column.py:120-122). */
    def logit(eps: Double): Column = graft.functions.GraftFunctions.logit(c, eps)
  }

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** Struct-wide fill_null broadcast (struct_column.py:73-85): fill
      * every (or the named) numeric column.
      */
    def fillNullAll(v: Any, cols: Seq[String] = Nil): DataFrame =
      if (cols.isEmpty) df.na.fill(v match { case d: Double => d; case n: Number => n.doubleValue })
      else df.na.fill(v match { case d: Double => d; case n: Number => n.doubleValue }, cols)

    /** The velox `transform` combinator (functional/velox.py:6-18):
      * apply f to every element of a list column, preserving shape and
      * nulls — Catalyst ArrayTransform, same flat-child asymptotics.
      */
    def transformList(listCol: String, f: Column => Column): DataFrame =
      df.withColumn(listCol, F.transform(col(listCol), f))

    /** Contiguous row slice (reference __getitem__(slice),
      * string_column.py:37-54): rows [start, start+n) of a total order.
      */
    def sliceRows(orderBy: Seq[Column], start: Int, n: Int): DataFrame =
      df.orderBy(orderBy: _*).offset(start).limit(n)

    /** Reference clone() ≈ materialized snapshot under immutability. */
    def snapshot(): DataFrame = { df.cache(); df }
  }
}
