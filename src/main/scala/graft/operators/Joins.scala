package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skew and scale.
  *
  * AQE's skew-join split (on by default) handles most runtime skew; the
  * explicit salted join is for the extreme case — one key holding a
  * double-digit percentage of rows — where even split shuffle blocks
  * overload, or when AQE is unavailable (e.g. inside cached plans).
  */
object Joins {

  /** Salted equi-join: the skewed (left) side gets a deterministic salt
    * in [0, saltFactor) hashed from `saltSource` (a high-cardinality
    * column); the right side is replicated saltFactor times. The join
    * key becomes (key, salt) — the hot key's rows spread over
    * saltFactor reducers. Result is row-identical to the plain join.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, joinCond: Column,
      saltSource: Column, saltFactor: Int): DataFrame = {
    val sl = left.withColumn("__salt", pmod(hash(saltSource), lit(saltFactor)))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    sl.join(sr, joinCond && sl("__salt") === sr("__salt"))
      .drop("__salt")
  }
}
