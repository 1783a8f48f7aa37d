package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.{Contamination, Dedup, Sampling}
import graft.sources.Tables

/** Corpus-hygiene pipeline operators: benchmark decontamination and
  * deterministic stratified sampling.
  */
object PipelineOps {

  /** Decontamination scan: docs with doc_id % 7 = 0 play the benchmark
    * ("eval") set; report train docs sharing ≥ 2 distinct word 3-grams
    * with any eval doc (real pipelines: 13-grams, same shape).
    */
  private val q28Contamination: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Contamination.ngramOverlap(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", n = 3, minShared = 2)
      .orderBy("train_id", "eval_id")
  }

  /** Deterministic stratified sampling: downsample the dominant
    * language (en → 50%) and keep 15% of the rest, membership decided
    * by a stable hash of doc_id — reproducible across runs, engines,
    * and corpus growth.
    */
  private val q29StratifiedSample: Q = (s, d) =>
    Sampling.stratified(Tables.documents(s, d), "lang", "doc_id",
        rates = Map("en" -> 0.5), defaultRate = 0.15)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_id"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("lang")

  /** Per-source document cap (crawl-pipeline staple: no single domain
    * may dominate the corpus): keep the 5 highest-quality docs per
    * source, through the native TopKPerGroup physical operator on a
    * natural key — bounded heaps per scan partition, survivor-only
    * shuffle, never a full per-source sort.
    */
  private val q37SourceCap: Q = (s, d) => {
    import graft.functions.TextFunctions.{qualityScore, words}
    val scored = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        round(qualityScore(col("text"), words(col("text"))), 9).as("q"))
    graft.operators.TopK.perGroup(scored, Seq("source"),
        Seq(("q", true), ("doc_id", false)), k = 5)
      .select(col("source"), col("rank"), col("doc_id"), round(col("q"), 6).as("quality"))
      .orderBy("source", "rank")
  }

  /** source × lang contingency table (corpus composition dashboard).
    * groupBy + explicit-values pivot, NOT `df.stat.crosstab`: crosstab
    * collects the distinct value set AND builds the whole contingency
    * table on the driver, so an unbounded-cardinality column OOMs the
    * driver at corpus scale. The pivot form is one ordinary shuffle on
    * the group key with the value columns fixed up front — fully
    * distributed, and skipping the extra distinct-values job.
    */
  private val q98Crosstab: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("source").as("source_lang"))
      .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
      .count()
      .na.fill(0L)
      .orderBy("source_lang")

  /** Capstone: the composed training-data pipeline, every stage an
    * operator from this library — quality gate → exact dedup (keep
    * min-id per content) → benchmark decontamination (drop train docs
    * sharing ≥ 2 3-grams with the doc_id % 7 = 0 eval set) → per-lang
    * stratified sampling → per-lang doc/token accounting. One
    * oracle-checked query proving the stages compose.
    */
  private val q99PipelineE2E: Q = (s, d) => {
    import graft.functions.TextFunctions.{qualityScore, words}
    val docs = Tables.documents(s, d)
    val clean = docs
      .withColumn("__q", qualityScore(col("text"), words(col("text"))))
      .filter(col("__q") >= 0.5)
    val deduped = clean.join(
      Dedup.exactGroups(clean, "doc_id", "text")
        .select(col("kept_id").as("doc_id")),
      Seq("doc_id"))
    val train = deduped.filter(col("doc_id") % 7 =!= 0)
    val contaminated = Contamination.ngramOverlap(
        train, deduped.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", n = 3, minShared = 2)
      .select(col("train_id").as("doc_id")).distinct()
    val decontaminated = train.join(contaminated, Seq("doc_id"), "left_anti")
    Sampling.stratified(decontaminated, "lang", "doc_id",
        rates = Map("en" -> 0.5), defaultRate = 0.15)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words(col("text"))).cast("long")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("lang")
  }

  /** PageRank over the clickstream transition graph: consecutive
    * events by the same user (ordered by ts, event_id) form page→page
    * edges over the `props.k` page ids; 5 damped rounds with
    * dangling-mass redistribution rank the pages — the link-centrality
    * quality prior of web curation, built from session transitions.
    */
  private val q110PageRank: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("page"),
        col("ts"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val edges = ev.select(lag(col("page"), 1).over(w).as("src"), col("page").as("dst"))
      .filter(col("src").isNotNull)
      .distinct()
    graft.operators.Graph.pageRank(edges, iters = 5)
      .select(col("id").as("page"), col("rank"))
      .orderBy("page")
  }

  /** Per-language quality-quantile gate: drop the bottom 60% of docs
    * per language by the standard quality score — the cutoff adapts
    * per group instead of one global constant. Exact percentile
    * threshold, broadcast back, scan-parallel filter.
    */
  private val q111QuantileFilter: Q = (s, d) => {
    import graft.functions.TextFunctions.{qualityScore, words}
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val docs = Tables.documents(s, d)
      .withColumn("q", qualityScore(col("text"), words(col("text"))))
    Sampling.quantileFilter(docs, "lang", "q", 0.6)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_doc"),
        sum(col("doc_id")).as("id_sum"),
        round(sum(col("q").cast(DecimalType(30, 12))).cast(DoubleType) /
          count(lit(1)), 6).as("avg_q"))
      .orderBy("lang")
  }

  /** DSIR-style domain-targeted selection weights: English docs play
    * the target domain; every doc is scored by the log-likelihood
    * ratio of its tokens under the target vs raw unigram models
    * (add-one smoothed). The standard importance-resampling scoring
    * pass of modern pretraining curation.
    */
  private val q113ImportanceWeights: Q = (s, d) =>
    Sampling.importanceLogWeights(Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en")
      .select(col("id").as("doc_id"), col("n_words"), col("log_weight"))
      .orderBy("doc_id")

  /** Deterministic mixture sampling: downsample three sources to a
    * 50/25/25 pretraining mix — the largest corpus achievable without
    * upsampling (the binding stratum keeps everything, others shed
    * rows via the reproducible hash-threshold rule).
    */
  private val q114MixtureSample: Q = (s, d) =>
    Sampling.toMixture(Tables.documents(s, d), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_id"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("source")

  /** MERGE/upsert corpus maintenance: a deterministic change batch
    * (re-scored copies of every 20th doc + brand-new docs) reconciles
    * into the corpus in one full-outer pass — updates win on key
    * match, inserts append, untouched rows pass through.
    */
  private val q125MergeUpsert: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val updates = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        (col("n_chars") + 1000).as("n_chars"))
    val inserts = docs.filter(col("doc_id") % 20 === 5)
      .select((col("doc_id") + 900000).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
    graft.operators.Merge.upsert(docs, updates.unionByName(inserts), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  /** Z-order values over (customer, order) — the Morton interleave
    * behind `clusterByZ`'s layout rewrite, emitted per row so the
    * curve itself is oracle-checked bit-for-bit.
    */
  private val q126Zorder: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        graft.operators.Layout.zValue(
          pmod(col("o_custkey"), lit(1024)), pmod(col("o_orderkey"), lit(1024)), 10)
          .as("zval"))
      .orderBy("o_orderkey")

  val defs: Map[String, Q] = Map(
    "q126_zorder" -> q126Zorder,
    "q125_merge_upsert" -> q125MergeUpsert,
    "q114_mixture_sample" -> q114MixtureSample,
    "q113_importance_weights" -> q113ImportanceWeights,
    "q111_quantile_filter" -> q111QuantileFilter,
    "q110_pagerank" -> q110PageRank,
    "q28_contamination" -> q28Contamination,
    "q29_stratified_sample" -> q29StratifiedSample,
    "q37_source_cap" -> q37SourceCap,
    "q98_crosstab" -> q98Crosstab,
    "q99_pipeline_e2e" -> q99PipelineE2E)

  /** One unrolled PageRank round for the q110 oracle — mirrors
    * Graph.pageRank's expression shapes exactly (decimal rank domain,
    * double intermediates, identical operand order).
    */
  private def prRound(i: Int): String = {
    val p = i - 1
    s"""c$i AS (SELECT e.dst, sum(CAST(CAST(r.rank AS DOUBLE) / r.deg AS DECIMAL(30,12))) cs
       |  FROM edges e JOIN r$p r ON e.src = r.id GROUP BY e.dst),
       |m$i AS (SELECT coalesce(CAST(sum(rank) AS DOUBLE), 0) m FROM r$p WHERE deg IS NULL),
       |r$i AS (SELECT b.id, b.deg,
       |    CAST((1 - 0.85)/(SELECT n FROM params) + 0.85 * (coalesce(CAST(c.cs AS DOUBLE), 0)
       |      + (SELECT m FROM m$i)/(SELECT n FROM params)) AS DECIMAL(30,12)) rank
       |  FROM base b LEFT JOIN c$i c ON b.id = c.dst)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q126_zorder" ->
      """SELECT o_orderkey,
        |  list_sum(list_transform(range(0, 10), b ->
        |    ((((o_custkey % 1024) >> b) & 1) << (2*b))
        |      + ((((o_orderkey % 1024) >> b) & 1) << (2*b + 1))))::BIGINT AS zval
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q125_merge_upsert" ->
      """WITH changes AS (
        |  SELECT doc_id, text, lang, source, n_chars + 1000 AS n_chars
        |  FROM documents WHERE doc_id % 20 = 0
        |  UNION ALL
        |  SELECT doc_id + 900000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 20 = 5),
        |merged AS (
        |  SELECT
        |    CASE WHEN c.doc_id IS NOT NULL THEN c.doc_id ELSE d.doc_id END AS doc_id,
        |    CASE WHEN c.doc_id IS NOT NULL THEN c.lang ELSE d.lang END AS lang,
        |    CASE WHEN c.doc_id IS NOT NULL THEN c.n_chars ELSE d.n_chars END AS n_chars
        |  FROM documents d FULL OUTER JOIN changes c ON d.doc_id = c.doc_id)
        |SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        |  max(doc_id) AS max_id
        |FROM merged GROUP BY lang ORDER BY lang""".stripMargin,
    "q114_mixture_sample" ->
      """WITH c AS (SELECT source AS s, count(*) AS n FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source),
        |w AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.25), ('src2', 0.25)) t(s, wt)),
        |j AS (SELECT c.s, c.n, w.wt / 1.0 AS wn FROM c JOIN w USING (s)),
        |sc AS (SELECT min(n / wn) AS scale FROM j),
        |r AS (SELECT s, least(1.0, (SELECT scale FROM sc) * wn / n) AS rate FROM j)
        |SELECT d.source, count(*) AS n_kept, min(d.doc_id) AS first_id,
        |  sum(d.doc_id)::BIGINT AS id_sum
        |FROM documents d JOIN r ON d.source = r.s
        |WHERE ('0x' || substr(md5('mix|' || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000 <
        |  CAST(floor(r.rate * 1000) AS BIGINT)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q113_importance_weights" ->
      """WITH toks AS (SELECT doc_id, lang = 'en' AS tgt,
        |    unnest(str_split(text, ' ')) AS word FROM documents),
        |vocab AS (SELECT word, count(*) AS cnt_all,
        |    sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS cnt_t
        |  FROM toks GROUP BY word),
        |tot AS (SELECT count(*)::DOUBLE AS total_all,
        |    sum(CASE WHEN tgt THEN 1 ELSE 0 END)::DOUBLE AS total_t,
        |    (SELECT count(*) FROM vocab)::DOUBLE AS v
        |  FROM toks),
        |lr AS (SELECT word,
        |    CAST(ln((cnt_t + 1) / (total_t + v)) - ln((cnt_all + 1) / (total_all + v))
        |      AS DECIMAL(20,9)) AS lw
        |  FROM vocab, tot)
        |SELECT doc_id, count(*) AS n_words,
        |  round(CAST(sum(lw) AS DOUBLE), 6) AS log_weight
        |FROM toks JOIN lr USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q111_quantile_filter" ->
      """WITH t AS (SELECT doc_id, lang, text, str_split(text, ' ') w FROM documents),
        |q AS (SELECT doc_id, lang,
        |    least(len(w)::DOUBLE / 100.0, 1.0) * 0.4
        |    + (len(list_distinct(w))::DOUBLE / len(w)::DOUBLE) * 0.3
        |    + ((length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE + 1.0)
        |       / (length(text)::DOUBLE + 1.0)) * 0.3 AS q
        |  FROM t),
        |thr AS (SELECT lang, quantile_cont(q, 0.6) AS thr FROM q GROUP BY lang)
        |SELECT q.lang, count(*) AS n_kept, min(doc_id) AS first_doc,
        |  sum(doc_id)::BIGINT AS id_sum,
        |  round(CAST(sum(CAST(q.q AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) AS avg_q
        |FROM q JOIN thr ON q.lang = thr.lang AND q.q >= thr.thr
        |GROUP BY q.lang ORDER BY q.lang""".stripMargin,
    "q110_pagerank" ->
      s"""WITH seq AS (SELECT user_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) page, ts, event_id
         |  FROM events),
         |edges AS (SELECT DISTINCT src, dst FROM (
         |    SELECT lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) src,
         |      page dst FROM seq)
         |  WHERE src IS NOT NULL),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
         |base AS (SELECT n.id, d.deg FROM nodes n LEFT JOIN deg d USING (id)),
         |params AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |r0 AS (SELECT id, deg,
         |    CAST(1.0/(SELECT n FROM params) AS DECIMAL(30,12)) AS rank FROM base),
         |${(1 to 5).map(prRound).mkString(",\n")}
         |SELECT id AS page, CAST(rank AS DOUBLE) AS rank
         |FROM r5 ORDER BY page""".stripMargin,
    "q28_contamination" ->
      """WITH docs AS (SELECT doc_id, str_split(text, ' ') w FROM documents),
        |sh AS (SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
        |    for i in range(1, greatest(len(w) - 2, 1) + 1)]) s
        |  FROM docs)
        |SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
        |  len(list_intersect(t.s, e.s))::BIGINT AS n_shared
        |FROM sh t JOIN sh e ON t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
        |WHERE len(list_intersect(t.s, e.s)) >= 2
        |ORDER BY train_id, eval_id""".stripMargin,
    "q29_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id,
        |  sum(doc_id)::BIGINT AS id_sum
        |FROM documents
        |WHERE ('0x' || substr(md5('sample|' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000 <
        |  (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.15 END * 1000)::BIGINT
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q37_source_cap" ->
      """WITH t AS (SELECT source, doc_id, text, str_split(text, ' ') w FROM documents),
        |scored AS (SELECT source, doc_id,
        |    round(least(len(w)::DOUBLE / 100.0, 1.0) * 0.4
        |      + (len(list_distinct(w))::DOUBLE / len(w)::DOUBLE) * 0.3
        |      + ((length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE + 1.0)
        |         / (length(text)::DOUBLE + 1.0)) * 0.3, 9) AS q
        |  FROM t),
        |r AS (SELECT source, doc_id, q,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY q DESC, doc_id ASC)::INT AS rank
        |  FROM scored)
        |SELECT source, rank, doc_id, round(q, 6) AS quality
        |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "q98_crosstab" ->
      """SELECT source AS source_lang,
        |  sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS de,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS en,
        |  sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS es,
        |  sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS fr,
        |  sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS zh
        |FROM documents GROUP BY source ORDER BY source_lang""".stripMargin,
    "q99_pipeline_e2e" ->
      """WITH scored AS (SELECT doc_id, lang, text, str_split(text, ' ') w,
        |    least(len(str_split(text, ' '))::DOUBLE / 100.0, 1.0) * 0.4
        |      + (len(list_distinct(str_split(text, ' ')))::DOUBLE
        |         / len(str_split(text, ' '))::DOUBLE) * 0.3
        |      + ((length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE + 1.0)
        |         / (length(text)::DOUBLE + 1.0)) * 0.3 AS q
        |  FROM documents),
        |clean AS (SELECT doc_id, lang, text, w FROM scored WHERE q >= 0.5),
        |dedup AS (SELECT * FROM clean WHERE doc_id IN (
        |    SELECT min(doc_id) FROM clean GROUP BY md5(text))),
        |sh AS (SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
        |    for i in range(1, greatest(len(w) - 2, 1) + 1)]) s FROM dedup),
        |contaminated AS (SELECT DISTINCT t.doc_id FROM sh t JOIN sh e
        |  ON t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
        |  WHERE len(list_intersect(t.s, e.s)) >= 2),
        |train AS (SELECT * FROM dedup WHERE doc_id % 7 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |sampled AS (SELECT * FROM train
        |  WHERE ('0x' || substr(md5('sample|' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000 <
        |    (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.15 END * 1000)::BIGINT)
        |SELECT lang, count(*) AS n_docs,
        |  sum(len(str_split(text, ' ')))::BIGINT AS n_tokens,
        |  min(doc_id) AS first_doc
        |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin)
}
