package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.{DataType, NumericType, StructType}

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

    /** Struct-wide numeric broadcast (struct_column.py:88-105): apply
      * `f` to every numeric column, recursing into struct fields the
      * way the reference recurses into nested StructColumns (the
      * criteo demo nests a whole frame as `dense_grp`,
      * demo/criteo.py:24-25). Non-numeric leaves pass through
      * unchanged; null structs stay null.
      */
    def mapNumericAll(f: Column => Column, cols: Seq[String] = Nil): DataFrame = {
      def rec(c: Column, dt: DataType): Column = dt match {
        case s: StructType =>
          val rebuilt = F.struct(s.fields.toSeq.map(fl =>
            rec(c.getField(fl.name), fl.dataType).as(fl.name)): _*)
          F.when(c.isNotNull, rebuilt)
        case _: NumericType => f(c)
        case _ => c
      }
      val pick = if (cols.isEmpty) df.schema.fieldNames.toSet else cols.toSet
      df.select(df.schema.fields.toSeq.map { fl =>
        if (pick(fl.name)) rec(col(fl.name), fl.dataType).as(fl.name)
        else col(fl.name)
      }: _*)
    }

    /** `frame + scalar` broadcast over all (nested) numeric fields
      * (struct_column.py:88-97).
      */
    def addAll(v: Double, cols: Seq[String] = Nil): DataFrame =
      mapNumericAll(_ + lit(v), cols)

    /** `frame.log()` broadcast over all (nested) numeric fields
      * (struct_column.py:99-105).
      */
    def logAll(cols: Seq[String] = Nil): DataFrame =
      mapNumericAll(F.log(_), cols)

    /** In-memory Arrow IPC export (reference to_arrow,
      * string_column.py:76-87) — see [[graft.sources.ArrowInterop]]
      * for scope.
      */
    def toArrowBytes: Array[Byte] = graft.sources.ArrowInterop.toArrowBytes(df)
  }
}
