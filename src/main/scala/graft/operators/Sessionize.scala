package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: the gap rule (a new session starts after
  * `gapMicros` of inactivity) as a per-key window pass — lag to find
  * the gap, a running sum of session-start flags to number sessions.
  * Both windows are keyed by the session key, so the operator is fully
  * parallel across keys at any scale; within-key cost is the key's own
  * event count, the inherent lower bound for ordered sessionization.
  */
object Sessionize {

  /** Adds `sid` (1-based session ordinal within key) to `df`.
    *
    * @param keyCol      session key (e.g. user id)
    * @param tsMicrosCol event time in epoch microseconds
    * @param tieCols     extra ordering columns for same-microsecond rows
    *                    (determinism across engines and partitionings)
    * @param gapMicros   inactivity gap that starts a new session
    */
  def assign(df: DataFrame, keyCol: Column, tsMicrosCol: Column,
      tieCols: Seq[Column], gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsMicrosCol +: tieCols: _*)
    df.withColumn("__prev_ts", lag(tsMicrosCol, 1).over(w))
      .withColumn("__new_s", when(col("__prev_ts").isNull ||
        tsMicrosCol - col("__prev_ts") > gapMicros, 1L).otherwise(0L))
      .withColumn("sid", sum(col("__new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_s")
  }
}
