package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.mdHash

/** Deterministic sampling for training-data pipelines.
  *
  * Everything keys off the 60-bit cross-engine md5 hash of a stable row
  * key — NOT `rand()` — so samples are reproducible across runs,
  * partitionings, and engines (resumable jobs, auditable splits), and a
  * row's membership never changes when the corpus around it grows.
  * Pure per-row expressions: no shuffle, fully scan-parallel.
  */
object Sampling {

  /** Per-stratum deterministic sampling: keep a row iff
    * `hash(salt, key) mod granularity < rate(stratum) · granularity`.
    * `rates` maps stratum value → keep-rate in [0,1]; strata not in the
    * map use `defaultRate`. Rate resolution is 1/granularity.
    */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "sample", granularity: Int = 1000): DataFrame = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rates must be in [0,1], got $r"))
    val rate: Column = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (stratum, r)) => when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(
      pmod(mdHash(lit(salt), col(keyCol)), lit(granularity.toLong)) <
        (rate * granularity).cast("long"))
  }

  /** Per-group quantile gate: keep rows whose `scoreCol` is at or
    * above their group's exact p-th percentile (linear interpolation,
    * the percentile_cont definition) — "drop the bottom 60% of docs
    * per language by quality" with a cutoff that adapts per group
    * instead of one global constant.
    *
    * Scale shape: one partial-aggregable percentile aggregation per
    * group (|groups| rows out), broadcast back, one scan-parallel
    * filter — the row set never shuffles. Group count is assumed
    * small (languages, sources); the exact percentile agg buffers its
    * group's values, so for million-group corpora swap in
    * approx_percentile and accept the sketch error.
    */
  def quantileFilter(df: DataFrame, groupCol: String, scoreCol: String,
      p: Double): DataFrame = {
    require(p >= 0 && p <= 1, s"p must be in [0,1], got $p")
    val thr = df.groupBy(col(groupCol).as("__grp"))
      .agg(percentile(col(scoreCol), lit(p)).as("__thr"))
    df.join(broadcast(thr),
        df(groupCol) === thr("__grp") && df(scoreCol) >= thr("__thr"), "inner")
      .drop("__grp", "__thr")
  }
}
