package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Q
import graft.functions.TextFunctions.{mdHash, words}
import graft.operators.Similarity
import graft.sources.Tables

/** Round-11 wave 32: min-k% memorization flags, table snapshot diff,
  * and Fellegi-Sunter record-linkage weights.
  */
object Curation63 {

  /** q462: min-k% membership/memorization screen — the contamination
    * heuristic from LLM membership inference: score each document by
    * the MEAN OF ITS k%=20 LOWEST token log-probs under the self-trained
    * add-1 bigram LM; documents whose worst tokens are still
    * high-probability (score near the top of the corpus) are the
    * memorization/duplication suspects. Readout per source: the exact
    * p95 score (order statistic, source-keyed rank window), the top-5%
    * mean, and its lift over the corpus mean. LM fit is two keyed
    * count joins; per-doc selection is a doc-keyed rank window.
    */
  private val q462MinkProb: Q = (s, d) => {
    // spread the single-row-group doc scan, then SPILL the bigram table
    // once: its four consumers (bigram counts, prefix counts, vocab,
    // the scored join) each re-ran the full tokenize+explode otherwise
    val docs = graft.Tuning.spread(Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text")))
      .select(col("doc_id"), col("source"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    val bigrams = graft.operators.Materialize.spillRelease(
      docs.select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(2), size(col("w"))), i =>
          struct((i - 1).as("pos"), element_at(col("w"), i - 1).as("prev"),
            element_at(col("w"), i).as("cur")))).as("bg"))
      .select(col("doc_id"), col("source"), col("bg.pos").as("pos"),
        col("bg.prev").as("prev"), col("bg.cur").as("cur")))
    val bgCounts = bigrams.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val prefCounts = bigrams.groupBy("prev").agg(count(lit(1)).as("cp"))
    val vv = broadcast(bigrams.agg(countDistinct(col("cur")).as("v")))
    val scored = bigrams.join(bgCounts, Seq("prev", "cur"))
      .join(prefCounts, Seq("prev")).crossJoin(vv)
      .withColumn("lp", round(log((col("cb") + 1).cast(DoubleType) /
        (col("cp") + col("v"))), 9).cast(DecimalType(24, 9)))
    val wD = Window.partitionBy("doc_id")
    val perDoc = scored
      .withColumn("rn", row_number().over(wD.orderBy(col("lp").asc, col("pos").asc)))
      .withColumn("t", count(lit(1)).over(wD))
      .filter(col("rn") <= ((col("t") + 4) / 5).cast(LongType))
      .groupBy("doc_id", "source")
      .agg(round(sum(col("lp")).cast(DoubleType) / count(lit(1)), 9)
        .cast(DecimalType(24, 9)).as("mink"))
    val wS = Window.partitionBy("source")
    perDoc
      .withColumn("rk", row_number().over(wS.orderBy(col("mink").desc, col("doc_id").asc)))
      .withColumn("nd", count(lit(1)).over(wS))
      .groupBy("source")
      .agg(max(col("nd")).as("n_docs"),
        round(sum(col("mink")).cast(DoubleType) / count(lit(1)), 6).as("mean_mink"),
        round(max(when(col("rk") === ((col("nd") + 19) / 20).cast(LongType)
          .cast("int"), col("mink"))).cast(DoubleType), 6).as("p95_mink"),
        round(sum(when(col("rk") <= ((col("nd") + 19) / 20).cast(LongType),
          col("mink"))).cast(DoubleType) /
          sum(when(col("rk") <= ((col("nd") + 19) / 20).cast(LongType), 1L)
            .otherwise(0L)), 6).as("mean_top5pct"))
      .orderBy("source")
  }

  /** q463: table snapshot diff — the migration/ingest readout that says
    * what actually changed between two versions of a table: one full
    * outer join on the natural key classifies every row as added /
    * removed / changed / unchanged, with an order-independent checksum
    * per class (the q458 commutative-sum channel) so two diffs can
    * themselves be compared cheaply. The "new" version is derived by
    * deterministic md5 channels (delete ~1/89, mutate ~1/97, re-key
    * ~1/83), so the expected class counts are data-derived, not
    * hand-written.
    */
  private val q463TableDiff: Q = (s, d) => {
    // the natural key collapses to ONE 60-bit md5 hash at the scan, and
    // every downstream channel (delete/mutate/re-key) seeds off that
    // LONG — the first cut hashed, joined, and checksummed the full pk
    // STRING four separate times, and the string-keyed full-outer
    // shuffle measured 148.5 s at sf10 (24× the sf1 time, pure shuffle
    // width + repeated long-string md5). Collision odds in the 2^60
    // space at 10^8 rows are ~0.4% for even ONE pair corpus-wide, and
    // the oracle computes the identical hash so any collision
    // classifies identically in both engines.
    // spread the single-row-group scan so the md5 pass runs at session
    // width, and SPILL the 16-byte-row hash table once: its three
    // consumers (kept, added, and the base join side) each re-ran the
    // scan+md5 otherwise
    val base = graft.operators.Materialize.spillRelease(
      graft.Tuning.spread(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_quantity")))
      .select(
        mdHash(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))).as("hv"),
        col("l_quantity").cast(LongType).as("qty")))
    // ONE seeded md5 yields all three channels by residue slicing
    // (89·97·83 ≈ 2^19.5 of the 60 uniform bits — the stage ledger
    // showed ~800 CPU-seconds at sf10 going to three separate
    // per-row md5s where one suffices)
    val chan = mdHash(lit("chan"), col("hv"))
    val kept = base.withColumn("ch", chan)
      .filter(col("ch") % 89 =!= 1)
      // integral div, NOT `/`: Spark's / is double division and ch
      // exceeds 2^53
      .withColumn("qty", when(expr("(ch div 89) % 97") === 0,
        col("qty") + 1).otherwise(col("qty")))
      .drop("ch")
    val added = base.withColumn("ch", chan)
      .filter(expr("(ch div 8633) % 83") === 2) // 8633 = 89*97
      .withColumn("hv", mdHash(lit("rk"), col("hv")))
      .drop("ch")
    val newV = kept.unionByName(added)
    val b = base.select(col("hv").as("bhv"), col("qty").as("bqty"))
    val n = newV.select(col("hv").as("nhv"), col("qty").as("nqty"))
    val joined = b.join(n, col("bhv") === col("nhv"), "full_outer")
      .select(
        when(col("bhv").isNull, lit("added"))
          .when(col("nhv").isNull, lit("removed"))
          .when(col("bqty") =!= col("nqty"), lit("changed"))
          .otherwise(lit("unchanged")).as("category"),
        coalesce(col("bhv"), col("nhv")).as("hv"))
    joined.groupBy("category")
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("hv").cast(DecimalType(38, 0))) %
          lit(1152921504606846976L)).cast(LongType).as("checksum"))
      .orderBy("category")
  }

  /** q464: Fellegi-Sunter record linkage — probabilistic matching with
    * per-field m (agree | match) and u (agree | unmatch) probabilities
    * ESTIMATED from the candidate pairs themselves: every customer
    * spawns a corrupted copy (field-level md5 noise channels), blocking
    * caps candidate pairs at ≤8 records per block (the
    * fixedCountModulus(target=8) ladder, so pair volume stays ~8n at
    * any scale), and each pair scores Σ log2(m/u) over agreeing fields
    * + Σ log2((1−m)/(1−u)) over disagreeing. Classification at weight
    * > 0 reads out as a confusion matrix against the known truth.
    */
  private val q464FellegiSunter: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val nC = c.count()
    val blockMod = Similarity.fixedCountModulus(nC, target = 8L)
    val orig = c.select(col("c_custkey").as("id"), col("c_name").as("nm"),
      col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"))
    val copy = orig
      .withColumn("nm", when(mdHash(lit("fsnm"), col("id")) % 10 === 0,
        concat(col("nm"), lit("~"))).otherwise(col("nm")))
      .withColumn("nat", when(mdHash(lit("fsnat"), col("id")) % 7 === 1,
        (col("nat") + 1) % 25).otherwise(col("nat")))
      .withColumn("seg", when(mdHash(lit("fsseg"), col("id")) % 5 === 2,
        lit("CORRUPTED")).otherwise(col("seg")))
    val a = orig.select((col("id") % blockMod).as("blk"), col("id").as("ida"),
      col("nm").as("nma"), col("nat").as("nata"), col("seg").as("sega"))
    val bb = copy.select((col("id") % blockMod).as("blk"), col("id").as("idb"),
      col("nm").as("nmb"), col("nat").as("natb"), col("seg").as("segb"))
    val pairs = a.join(bb, Seq("blk"))
      .select(col("ida"), col("idb"),
        (col("ida") === col("idb")).as("is_match"),
        (col("nma") === col("nmb")).cast(LongType).as("g_nm"),
        (col("nata") === col("natb")).cast(LongType).as("g_nat"),
        (col("sega") === col("segb")).cast(LongType).as("g_seg"))
    // per-field m/u from the labeled pairs, clamped away from 0/1
    def rate(g: String, m: Boolean) =
      round(greatest(least(
        sum(when(col("is_match") === m, col(g))).cast(DoubleType) /
          sum(when(col("is_match") === m, 1L).otherwise(0L)),
        lit(0.99)), lit(0.01)), 9)
    val mu = broadcast(pairs.agg(
      rate("g_nm", m = true).as("m_nm"), rate("g_nm", m = false).as("u_nm"),
      rate("g_nat", m = true).as("m_nat"), rate("g_nat", m = false).as("u_nat"),
      rate("g_seg", m = true).as("m_seg"), rate("g_seg", m = false).as("u_seg")))
    def term(g: String, mc: String, uc: String) =
      when(col(g) === 1, round(log2(col(mc) / col(uc)), 9))
        .otherwise(round(log2((lit(1.0) - col(mc)) / (lit(1.0) - col(uc))), 9))
    val weighted = pairs.crossJoin(mu)
      .withColumn("wgt", round(term("g_nm", "m_nm", "u_nm") +
        term("g_nat", "m_nat", "u_nat") + term("g_seg", "m_seg", "u_seg"), 9)
        .cast(DecimalType(24, 9)))
    weighted.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("is_match") && col("wgt") > 0, 1L).otherwise(0L)).as("tp"),
      sum(when(!col("is_match") && col("wgt") > 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("is_match") && col("wgt") <= 0, 1L).otherwise(0L)).as("fn"),
      sum(when(!col("is_match") && col("wgt") <= 0, 1L).otherwise(0L)).as("tn"))
      .select(col("n_pairs"), col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp").cast(DoubleType) / (col("tp") + col("fp")), 6).as("precision"),
        round(col("tp").cast(DoubleType) / (col("tp") + col("fn")), 6).as("recall"))
  }

  val defs: Map[String, Q] = Map(
    "q462_mink_prob" -> q462MinkProb,
    "q463_table_diff" -> q463TableDiff,
    "q464_fellegi_sunter" -> q464FellegiSunter)

  val oracles: Map[String, String] = Map(
    "q462_mink_prob" ->
      """WITH docs AS (SELECT doc_id, source, str_split(text, ' ') w FROM documents
        |  WHERE len(str_split(text, ' ')) >= 2),
        |bigrams AS (SELECT doc_id, source, i - 1 pos, w[i - 1] prev, w[i] cur
        |  FROM docs, unnest(generate_series(2, len(w))) t(i)),
        |bg AS (SELECT prev, cur, count(*) cb FROM bigrams GROUP BY prev, cur),
        |pf AS (SELECT prev, count(*) cp FROM bigrams GROUP BY prev),
        |vv AS (SELECT count(DISTINCT cur) v FROM bigrams),
        |scored AS (SELECT doc_id, source, pos,
        |    CAST(round(ln((cb + 1)::DOUBLE / (cp + v)), 9) AS DECIMAL(24,9)) lp
        |  FROM bigrams JOIN bg USING (prev, cur) JOIN pf USING (prev), vv),
        |perdoc AS (SELECT doc_id, source,
        |    CAST(round(CAST(sum(lp) AS DOUBLE) / count(*), 9) AS DECIMAL(24,9)) mink
        |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY lp ASC, pos ASC) rn,
        |      count(*) OVER (PARTITION BY doc_id) t FROM scored)
        |  WHERE rn <= (t + 4) // 5 GROUP BY doc_id, source),
        |rk AS (SELECT source, mink,
        |    row_number() OVER (PARTITION BY source ORDER BY mink DESC, doc_id ASC) rk,
        |    count(*) OVER (PARTITION BY source) nd FROM perdoc)
        |SELECT source, max(nd)::BIGINT AS n_docs,
        |  round(CAST(sum(mink) AS DOUBLE) / count(*), 6) AS mean_mink,
        |  round(CAST(max(CASE WHEN rk = (nd + 19) // 20 THEN mink END) AS DOUBLE), 6)
        |    AS p95_mink,
        |  round(CAST(sum(CASE WHEN rk <= (nd + 19) // 20 THEN mink END) AS DOUBLE)
        |    / sum(CASE WHEN rk <= (nd + 19) // 20 THEN 1 ELSE 0 END), 6)
        |    AS mean_top5pct
        |FROM rk GROUP BY source ORDER BY source""".stripMargin,
    "q463_table_diff" ->
      """WITH li AS (SELECT ('0x' || substr(md5(l_orderkey::VARCHAR || '|'
        |      || l_linenumber::VARCHAR || '|' || l_partkey::VARCHAR || '|'
        |      || l_suppkey::VARCHAR), 1, 15))::BIGINT hv,
        |    CAST(l_quantity AS BIGINT) qty
        |  FROM lineitem),
        |chn AS (SELECT hv, qty,
        |    ('0x' || substr(md5('chan|' || hv::VARCHAR), 1, 15))::BIGINT ch
        |  FROM li),
        |kept AS (SELECT hv,
        |    CASE WHEN (ch // 89) % 97 = 0 THEN qty + 1 ELSE qty END qty
        |  FROM chn WHERE ch % 89 <> 1),
        |added AS (SELECT ('0x' || substr(md5('rk|' || hv::VARCHAR), 1, 15))::BIGINT
        |      hv, qty
        |  FROM chn WHERE (ch // 8633) % 83 = 2),
        |newv AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
        |j AS (SELECT CASE WHEN b.hv IS NULL THEN 'added'
        |      WHEN n.hv IS NULL THEN 'removed'
        |      WHEN b.qty <> n.qty THEN 'changed' ELSE 'unchanged' END category,
        |    coalesce(b.hv, n.hv) hv
        |  FROM li b FULL OUTER JOIN newv n ON b.hv = n.hv)
        |SELECT category, count(*) AS n_rows,
        |  CAST(sum(hv) % 1152921504606846976 AS BIGINT) AS checksum
        |FROM j GROUP BY category ORDER BY category""".stripMargin,
    "q464_fellegi_sunter" -> {
      s"""WITH orig AS (SELECT c_custkey id, c_name nm, c_nationkey nat,
        |    c_mktsegment seg FROM customer),
        |bm AS (SELECT ${Similarity.fixedCountModulusLadderSql("c", target = 8L)} b_m
        |  FROM (SELECT count(*) c FROM orig)),
        |cpy AS (SELECT id,
        |    CASE WHEN ('0x' || substr(md5('fsnm|' || id::VARCHAR), 1, 15))::BIGINT
        |      % 10 = 0 THEN nm || '~' ELSE nm END nm,
        |    CASE WHEN ('0x' || substr(md5('fsnat|' || id::VARCHAR), 1, 15))::BIGINT
        |      % 7 = 1 THEN (nat + 1) % 25 ELSE nat END nat,
        |    CASE WHEN ('0x' || substr(md5('fsseg|' || id::VARCHAR), 1, 15))::BIGINT
        |      % 5 = 2 THEN 'CORRUPTED' ELSE seg END seg
        |  FROM orig),
        |pairs AS (SELECT a.id ida, b.id idb, a.id = b.id is_match,
        |    CASE WHEN a.nm = b.nm THEN 1 ELSE 0 END g_nm,
        |    CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END g_nat,
        |    CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END g_seg
        |  FROM orig a JOIN cpy b ON a.id % (SELECT b_m FROM bm)
        |    = b.id % (SELECT b_m FROM bm)),
        |mu AS (SELECT
        |    round(greatest(least(sum(CASE WHEN is_match THEN g_nm END)::DOUBLE
        |      / sum(CASE WHEN is_match THEN 1 ELSE 0 END), 0.99), 0.01), 9) m_nm,
        |    round(greatest(least(sum(CASE WHEN NOT is_match THEN g_nm END)::DOUBLE
        |      / sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END), 0.99), 0.01), 9) u_nm,
        |    round(greatest(least(sum(CASE WHEN is_match THEN g_nat END)::DOUBLE
        |      / sum(CASE WHEN is_match THEN 1 ELSE 0 END), 0.99), 0.01), 9) m_nat,
        |    round(greatest(least(sum(CASE WHEN NOT is_match THEN g_nat END)::DOUBLE
        |      / sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END), 0.99), 0.01), 9) u_nat,
        |    round(greatest(least(sum(CASE WHEN is_match THEN g_seg END)::DOUBLE
        |      / sum(CASE WHEN is_match THEN 1 ELSE 0 END), 0.99), 0.01), 9) m_seg,
        |    round(greatest(least(sum(CASE WHEN NOT is_match THEN g_seg END)::DOUBLE
        |      / sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END), 0.99), 0.01), 9) u_seg
        |  FROM pairs),
        |wt AS (SELECT is_match,
        |    CAST(round(
        |      (CASE WHEN g_nm = 1 THEN round(log2(m_nm / u_nm), 9)
        |        ELSE round(log2((1.0 - m_nm) / (1.0 - u_nm)), 9) END)
        |      + (CASE WHEN g_nat = 1 THEN round(log2(m_nat / u_nat), 9)
        |        ELSE round(log2((1.0 - m_nat) / (1.0 - u_nat)), 9) END)
        |      + (CASE WHEN g_seg = 1 THEN round(log2(m_seg / u_seg), 9)
        |        ELSE round(log2((1.0 - m_seg) / (1.0 - u_seg)), 9) END), 9)
        |      AS DECIMAL(24,9)) wgt
        |  FROM pairs, mu)
        |SELECT count(*) AS n_pairs,
        |  sum(CASE WHEN is_match AND wgt > 0 THEN 1 ELSE 0 END)::BIGINT AS tp,
        |  sum(CASE WHEN NOT is_match AND wgt > 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
        |  sum(CASE WHEN is_match AND wgt <= 0 THEN 1 ELSE 0 END)::BIGINT AS fn,
        |  sum(CASE WHEN NOT is_match AND wgt <= 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
        |  round(sum(CASE WHEN is_match AND wgt > 0 THEN 1 ELSE 0 END)::DOUBLE
        |    / (sum(CASE WHEN is_match AND wgt > 0 THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN NOT is_match AND wgt > 0 THEN 1 ELSE 0 END)), 6)
        |    AS precision,
        |  round(sum(CASE WHEN is_match AND wgt > 0 THEN 1 ELSE 0 END)::DOUBLE
        |    / (sum(CASE WHEN is_match AND wgt > 0 THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN is_match AND wgt <= 0 THEN 1 ELSE 0 END)), 6)
        |    AS recall
        |FROM wt""".stripMargin
    })
}
