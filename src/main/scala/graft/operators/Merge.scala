package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert — the CDC-style maintenance verb warehouse engines
  * ship natively and plain Spark-on-parquet lacks: reconcile a target
  * table with a batch of changes in one pass.
  */
object Merge {

  /** Upsert `source` into `target` on `keyCol`:
    *   - matched rows take the source's values (update),
    *   - unmatched source rows are appended (insert),
    *   - unmatched target rows pass through untouched.
    * Both sides must share the schema; the result keeps the target's
    * column order. One full-outer hash join on the key — the exact
    * shape a MERGE INTO compiles to — so cost is one shuffle of each
    * side and nothing is driver-resident. For repeated maintenance at
    * scale the target would be bucketed by key so only the (small)
    * change batch shuffles.
    *
    * Keys must be unique on each side (standard MERGE precondition;
    * duplicate source keys would make the update ambiguous).
    */
  def upsert(target: DataFrame, source: DataFrame, keyCol: String): DataFrame = {
    require(target.columns.sameElements(source.columns),
      s"schemas must match: ${target.columns.mkString(",")} vs ${source.columns.mkString(",")}")
    val t = target.alias("t")
    val s = source.alias("s")
    val joined = t.join(s, t(keyCol) === s(keyCol), "full_outer")
    // row provenance decides per ROW (not per cell): a matched row takes
    // every source value — including genuine source NULLs, which a
    // cell-level coalesce would silently un-update
    val fromSource = s(keyCol).isNotNull
    val merged = target.columns.map { c =>
      when(fromSource, s(c)).otherwise(t(c)).as(c)
    }
    joined.select(merged.toIndexedSeq: _*)
  }
}
