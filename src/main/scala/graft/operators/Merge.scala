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
    // alias-qualified names, NOT t(col)/s(col) dataset accessors: when
    // the change batch derives from the target (the usual CDC case —
    // compaction, re-score), the accessors carry the same exprIds on
    // both sides and the analyzer rejects the self-join as ambiguous
    val joined = target.alias("t")
      .join(source.alias("s"), col(s"t.$keyCol") === col(s"s.$keyCol"), "full_outer")
    // row provenance decides per ROW (not per cell): a matched row takes
    // every source value — including genuine source NULLs, which a
    // cell-level coalesce would silently un-update
    val fromSource = col(s"s.$keyCol").isNotNull
    val merged = target.columns.map { c =>
      when(fromSource, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    joined.select(merged.toIndexedSeq: _*)
  }
}
