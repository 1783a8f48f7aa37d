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

  /** Deterministic downsampling to a target mixture: given desired
    * stratum proportions (e.g. source or language weights for a
    * pretraining mix), find the LARGEST corpus achievable by pure
    * downsampling — scale = min over strata of n_s/w_s — and keep
    * each stratum at rate (scale·w_s)/n_s via the same hash-threshold
    * rule as [[stratified]] (reproducible, grow-stable, engine-exact).
    * The binding stratum (the one scarcest relative to its weight)
    * keeps everything; others shed rows to match. Strata absent from
    * `weights` are dropped (rate 0). One count aggregation over the
    * strata (collected — stratum cardinality is small by definition),
    * then a scan-parallel filter; the row set never shuffles.
    */
  def toMixture(df: DataFrame, strataCol: String, keyCol: String,
      weights: Map[String, Double], salt: String = "mix",
      granularity: Int = 1000): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    weights.foreach { case (k, w) =>
      require(w > 0, s"weights must be positive, got $k -> $w") }
    val wSum = weights.values.sum
    val counts = df.groupBy(col(strataCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (k, _) => counts.getOrElse(k, 0L) > 0 }
    require(present.nonEmpty, "no stratum in `weights` is present in the data")
    val scale = present.map { case (k, w) => counts(k) / (w / wSum) }.min
    val rates = present.map { case (k, w) =>
      k -> math.min(1.0, scale * (w / wSum) / counts(k)) }
    stratified(df, strataCol, keyCol, rates, defaultRate = 0.0, salt, granularity)
  }

  /** DSIR-style importance log-weights for domain-targeted data
    * selection: score every doc by how much more likely its tokens are
    * under a unigram model of the target domain than under the raw
    * corpus —
    *
    *   logw(doc) = Σ_w  log p̂_target(w) − log p̂_raw(w)
    *
    * with add-one smoothing over the corpus vocabulary (so raw-only
    * words contribute a finite negative weight). `isTarget` marks the
    * in-domain rows (e.g. `col("lang") === "en"`, or a hand-curated
    * flag). Docs with high logw read like the target domain; feeding
    * the weights to [[quantileFilter]] yields the selection step.
    *
    * Scale shape: one token explode (linear in corpus tokens), one
    * partial-aggregable vocab count (both models fall out of the SAME
    * aggregation — a conditional sum per word), the |vocab|-row
    * log-ratio table broadcast back over the token stream, one
    * per-doc decimal sum. Two scalar count actions (token totals,
    * vocab size); nothing else leaves the executors. Per-word log
    * ratios are summed as DECIMAL(20,9) — partition-order-independent,
    * the established unigram-LM pattern.
    *
    * Returns (id, n_words, log_weight) per doc, log_weight rounded to
    * 6 dp.
    */
  def importanceLogWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.types.DoubleType
    // token stream is read three times (totals, vocab, final join) and
    // the vocab twice — persist both, release on exit (spillRelease)
    val toks = df.select(col(idCol).as("__id"), isTarget.as("__tgt"),
      explode(words(col(textCol))).as("word")).persist()
    val vocab = toks.groupBy("word").agg(
      count(lit(1)).as("cnt_all"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("cnt_t")).persist()
    val totals = toks.agg(
      count(lit(1)).as("total_all"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("total_t")).head()
    val totalAll = totals.getLong(0).toDouble
    val totalT = totals.getLong(1).toDouble
    val v = vocab.count().toDouble
    val lr = vocab.select(col("word"),
      (log((col("cnt_t") + 1) / lit(totalT + v)) -
        log((col("cnt_all") + 1) / lit(totalAll + v)))
        .cast("decimal(20,9)").as("lw"))
    val out = toks.join(broadcast(lr), Seq("word"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_words"), sum(col("lw")).as("slw"))
      .select(col("__id").as("id"), col("n_words"),
        round(col("slw").cast(DoubleType), 6).as("log_weight"))
    Materialize.spillRelease(out, toks, vocab)
  }
}
