package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Q
import graft.sources.Tables

/** Round-8 wave 11: density clustering, search-log bias auditing,
  * recommender offline evaluation, mixture modeling, and index-size
  * planning — grid-DBSCAN over the embedding plane, COEC position-bias
  * correction, temporal-holdout hit-rate@3, one EM step of a 2-Gaussian
  * mixture, and Elias-gamma posting-list compression estimates.
  */
object Curation41 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 15))

  /** q366: grid-DBSCAN over the first two embedding dimensions — the
    * standard scalable DBSCAN surrogate: bucket points into a bounded
    * 10×10 grid (ONE keyed pass over the corpus), call cells with ≥8
    * points core, and connect 8-adjacent core cells with 8 synchronous
    * min-label rounds. The cell grid is a bounded model contract
    * (≤100 rows at any corpus size), so the label rounds run
    * driver-side as exact integer arithmetic; the oracle replays the
    * identical 8 rounds as unrolled SQL. Cluster counts/sizes are
    * integers end-to-end; the only doubles are the shared bin-edge
    * quotients, computed with identical operations in both engines.
    */
  private val q366GridDbscan: Q = (s, d) => {
    import s.implicits._
    val xy = Tables.embeddings(s, d).select(
      element_at(col("embedding"), 1).cast(DoubleType).as("x"),
      element_at(col("embedding"), 2).cast(DoubleType).as("y"))
    val b = xy.agg(min(col("x")).as("xlo"), max(col("x")).as("xhi"),
      min(col("y")).as("ylo"), max(col("y")).as("yhi"))
    val cells = xy.crossJoin(broadcast(b))
      .select(
        least(floor((col("x") - col("xlo")) * 10 / (col("xhi") - col("xlo"))), lit(9))
          .cast("long").as("cx"),
        least(floor((col("y") - col("ylo")) * 10 / (col("yhi") - col("ylo"))), lit(9))
          .cast("long").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("n"))
    val dense = cells.filter(col("n") >= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var lbl: Map[(Long, Long), Long] =
      dense.map { case (cx, cy, _) => (cx, cy) -> (cx * 10 + cy) }.toMap
    for (_ <- 1 to 8) {
      lbl = dense.map { case (cx, cy, _) =>
        val m = dense.iterator
          .filter { case (bx, by, _) => (bx - cx).abs <= 1 && (by - cy).abs <= 1 }
          .map { case (bx, by, _) => lbl((bx, by)) }.min
        (cx, cy) -> m
      }.toMap
    }
    val byLbl = dense.groupBy { case (cx, cy, _) => lbl((cx, cy)) }
      .map { case (_, cs) => cs.map(_._3).sum }
    Seq((dense.length.toLong, dense.map(_._3).sum, byLbl.size.toLong,
      if (byLbl.isEmpty) 0L else byLbl.max))
      .toDF("n_core_cells", "n_core_points", "n_clusters", "max_cluster_points")
  }

  /** q367: COEC position-bias audit (clicks over expected clicks) —
    * the search-ranking diagnostic that normalizes a segment's
    * conversions by what the global position-CTR curve predicts for
    * its impression mix. Positions come from per-session windows
    * (bounded per-user partitions), the position-CTR curve is a
    * bounded ≤20-row broadcast, and each segment readout is one keyed
    * pass with a decimal-summed expectation. Counts are integers;
    * ctr/coec are exact integer quotients composed identically in both
    * engines.
    */
  private val q367PositionBiasCoec: Q = (s, d) => {
    val wSess = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), when(col("event_type") === "purchase", 1L).otherwise(0L).as("c"))
      .select(col("user_id"), least(row_number().over(wSess), lit(20)).as("pos"),
        col("c"))
    val curve = ev.groupBy("pos").agg(count(lit(1)).as("n"), sum(col("c")).as("cc"))
      .select(col("pos"),
        (col("cc").cast(DoubleType) / col("n").cast(DoubleType)).as("ctr"))
    val seg = ev.select((col("user_id") % 4).as("segment"), col("pos"), col("c"))
      .groupBy("segment", "pos").agg(count(lit(1)).as("n"), sum(col("c")).as("cc"))
    seg.join(broadcast(curve), "pos")
      .groupBy("segment")
      .agg(sum(col("cc")).as("clicks"),
        sum(dec(col("n").cast(DoubleType) * col("ctr"))).cast(DoubleType).as("expected"))
      .select(col("segment"), col("clicks"), round(col("expected"), 6).as("expected"),
        round(col("clicks").cast(DoubleType) / col("expected"), 6).as("coec"))
      .orderBy("segment")
  }

  /** q368: temporal-holdout offline evaluation of the q363 recommender
    * — train the capped co-purchase model on pre-1999 orders, score
    * top-3 recommendations per customer, and grade them against the
    * customer's actual post-1999 purchases (hit-rate@3, recall@3,
    * precision@3). The industry-standard offline protocol: the split
    * is by time, the model never sees test interactions, and the
    * candidate generation keeps the q363 scale contract (64-basket
    * interaction cap, top-20 similarity lists, per-customer top-k
    * windows — never an all-pairs stage).
    */
  private val q368RecHoldoutEval: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
      col("l_partkey").as("p"))
    val ordYear = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_custkey").as("c"), year(col("o_orderdate")).as("yr"))
    // ONE orders x lineitem join feeds all three train/test frames —
    // the first cut ran the join (the query's widest stage) three
    // times, once per derived distinct (round-10 ledger)
    val base = graft.operators.Materialize.spillRelease(
      ordYear.join(li, "o_orderkey")
        .select(col("o_orderkey").as("o"), col("c"), col("p"), col("yr")))
    val trainPurch = base.filter(col("yr") < 1999)
      .select(col("c"), col("p")).distinct().persist()
    val testPurch = base.filter(col("yr") >= 1999)
      .select(col("c"), col("p")).distinct().persist()
    val trainBp = base.filter(col("yr") < 1999)
      .select(col("o"), col("p")).distinct()
    val wCap = Window.partitionBy("p")
      .orderBy(graft.functions.TextFunctions.mdHash(
        concat_ws("|", lit("rh"), col("o"), col("p"))), col("o"))
    val capped = trainBp.withColumn("r", row_number().over(wCap))
      .filter(col("r") <= 64).select(col("o"), col("p"))
    val pairs = capped.groupBy("o").agg(collect_set(col("p")).as("ps"))
      .select(explode(col("ps")).as("u"), col("ps"))
      .select(col("u"), explode(col("ps")).as("v"))
      .filter(col("u") =!= col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cc"))
    val wTop = Window.partitionBy("u").orderBy(col("cc").desc, col("v"))
    val sim = pairs.withColumn("r", row_number().over(wTop))
      .filter(col("r") <= 20).select(col("u"), col("v"), col("cc"))
    val cand = trainPurch.select(col("c"), col("p").as("u"))
      .join(sim, "u")
      .groupBy("c", "v").agg(sum(col("cc")).as("score"))
      .join(trainPurch.select(col("c"), col("p").as("v")), Seq("c", "v"), "left_anti")
    val wRec = Window.partitionBy("c").orderBy(col("score").desc, col("v"))
    // Spill the top-3 recommendation list once: `recs` appears TWICE in
    // recsEval's subtree (recs ⋈ evalUsers, and evalUsers itself derives
    // from recs), and each instance recomputed the whole basket fan-out
    // (round-11 event log: the 1.46M→6.87M pair stage ran 3×). The
    // spilled frame is ≤3 rows per customer — the fan-out now runs once.
    val recs = graft.operators.Materialize.spillRelease(
      cand.withColumn("r", row_number().over(wRec))
        .filter(col("r") <= 3).select(col("c"), col("v")))
    val evalUsers = recs.select(col("c")).distinct()
      .join(testPurch.select(col("c")).distinct(), "c")
    val recsEval = recs.join(evalUsers, "c").persist()
    val hits = recsEval.join(testPurch.select(col("c"), col("p").as("v")), Seq("c", "v"))
    val perUser = recsEval.groupBy("c").agg(count(lit(1)).as("nr"))
      .join(hits.groupBy("c").agg(count(lit(1)).as("nh")), Seq("c"), "left")
      .join(testPurch.join(evalUsers, "c").groupBy("c").agg(count(lit(1)).as("nt")), "c")
      .select(col("c"), col("nr"), coalesce(col("nh"), lit(0L)).as("nh"), col("nt"))
    val out = perUser.agg(count(lit(1)).as("n_eval_users"),
        sum(col("nh")).as("n_hits"),
        round(sum(when(col("nh") > 0, 1L).otherwise(0L)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("hit_rate_3"),
        round(sum(col("nh")).cast(DoubleType) / sum(col("nt")).cast(DoubleType), 6)
          .as("recall_3"),
        round(sum(col("nh")).cast(DoubleType) / sum(col("nr")).cast(DoubleType), 6)
          .as("precision_3"))
    graft.operators.Materialize.spillRelease(out, trainPurch, testPurch, recsEval)
  }

  /** q369: one EM step of a two-component Gaussian mixture on the
    * event-value distribution — deterministic moment-based init
    * (μ±σ, equal weights, shared σ), E-step responsibilities as the
    * closed-form logistic of the quadratic difference (one scan,
    * identical per-row doubles in both engines), M-step as decimal-
    * summed weighted moments. The corpus never leaves the executors:
    * init moments and the M-step are keyed 1-row aggregates.
    */
  private val q369GmmEmStep: Q = (s, d) => {
    val x = Tables.events(s, d).select(col("value").as("x"))
    val mom = x.agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).cast(DoubleType).as("sx"),
      sum(dec(col("x") * col("x"))).cast(DoubleType).as("sxx"))
      .select(col("n"), (col("sx") / col("n").cast(DoubleType)).as("m"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n").cast(DoubleType)) /
          col("n").cast(DoubleType)).as("sd"))
    val e = x.crossJoin(broadcast(mom))
      .select(col("x"), (col("m") - col("sd")).as("mu1"),
        (col("m") + col("sd")).as("mu2"), col("sd"))
      .select(col("x"), col("mu1"), col("mu2"),
        (lit(1.0) / (lit(1.0) + exp(
          (((col("x") - col("mu2")) * (col("x") - col("mu2"))) -
            ((col("x") - col("mu1")) * (col("x") - col("mu1")))) /
          (lit(2.0) * col("sd") * col("sd"))))).as("r2"))
    e.agg(count(lit(1)).as("n"),
        sum(dec(col("r2"))).cast(DoubleType).as("sr2"),
        sum(dec(col("r2") * col("x"))).cast(DoubleType).as("sr2x"),
        sum(dec((lit(1.0) - col("r2")) * col("x"))).cast(DoubleType).as("sr1x"))
      .select(col("n"),
        round(lit(1.0) - col("sr2") / col("n").cast(DoubleType), 6).as("w1"),
        round(col("sr2") / col("n").cast(DoubleType), 6).as("w2"),
        round(col("sr1x") / (col("n").cast(DoubleType) - col("sr2")), 6).as("mu1_new"),
        round(col("sr2x") / col("sr2"), 6).as("mu2_new"))
  }

  /** q370: Elias-gamma posting-list size planning — estimate the
    * compressed inverted-index footprint per term from doc-id gap
    * statistics: gamma(g) = 2⌊log2 g⌋+1 bits, computed EXACTLY via
    * binary-string length (`bin`, identical in both engines — no
    * floating log2 at power-of-two boundaries). Per-term gaps are one
    * lag window over the (term, doc) postings (linear, partitioned by
    * term); the readout is integer sums and the compression ratio vs
    * raw 64-bit ids. Output: the 10 heaviest terms by compressed bits.
    */
  private val q370PostingCompression: Q = (s, d) => {
    val posting = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    val wTerm = Window.partitionBy("w").orderBy("doc_id")
    val gaps = posting
      .select(col("w"), col("doc_id"),
        coalesce(col("doc_id") - lag(col("doc_id"), 1).over(wTerm),
          col("doc_id") + 1).as("g"))
      .select(col("w"),
        (lit(2) * (length(bin(col("g"))) - 1) + 1).cast("long").as("bits"))
    gaps.groupBy("w")
      .agg(count(lit(1)).as("df"), sum(col("bits")).as("gamma_bits"))
      .select(col("w").as("term"), col("df"), col("gamma_bits"),
        round(col("gamma_bits").cast(DoubleType) /
          (col("df") * 64).cast(DoubleType), 6).as("vs_raw64"))
      .orderBy(col("gamma_bits").desc, col("term")).limit(10)
  }

  val defs: Map[String, Q] = Map(
    "q366_grid_dbscan" -> q366GridDbscan,
    "q367_position_bias_coec" -> q367PositionBiasCoec,
    "q368_rec_holdout_eval" -> q368RecHoldoutEval,
    "q369_gmm_em_step" -> q369GmmEmStep,
    "q370_posting_compression" -> q370PostingCompression)

  val oracles: Map[String, String] = Map(
    "q366_grid_dbscan" -> {
      val labelRounds = (2 to 9).map { i =>
        s"""l$i AS (SELECT a.cx, a.cy, min(b.lbl) lbl
           |  FROM dense a JOIN l${i - 1} b
           |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
           |  GROUP BY a.cx, a.cy)""".stripMargin
      }.mkString(",\n")
      s"""WITH xy AS (SELECT embedding[1]::DOUBLE x, embedding[2]::DOUBLE y
        |  FROM embeddings),
        |b AS (SELECT min(x) xlo, max(x) xhi, min(y) ylo, max(y) yhi FROM xy),
        |cells AS (SELECT
        |    least(floor((x - xlo) * 10 / (xhi - xlo)), 9)::BIGINT cx,
        |    least(floor((y - ylo) * 10 / (yhi - ylo)), 9)::BIGINT cy, count(*) n
        |  FROM xy CROSS JOIN b GROUP BY 1, 2),
        |dense AS (SELECT cx, cy, n FROM cells WHERE n >= 8),
        |l1 AS (SELECT cx, cy, cx * 10 + cy lbl FROM dense),
        |$labelRounds,
        |sized AS (SELECT l.lbl, sum(d.n) pts FROM dense d
        |  JOIN l9 l ON l.cx = d.cx AND l.cy = d.cy GROUP BY l.lbl)
        |SELECT (SELECT count(*) FROM dense)::BIGINT AS n_core_cells,
        |  (SELECT coalesce(sum(n), 0) FROM dense)::BIGINT AS n_core_points,
        |  count(*)::BIGINT AS n_clusters,
        |  coalesce(max(pts), 0)::BIGINT AS max_cluster_points
        |FROM sized""".stripMargin
    },
    "q367_position_bias_coec" ->
      """WITH ev AS (SELECT user_id,
        |    least(row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts, event_id), 20) pos,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END c
        |  FROM events),
        |curve AS (SELECT pos, sum(c)::DOUBLE / count(*)::DOUBLE ctr
        |  FROM ev GROUP BY pos),
        |seg AS (SELECT user_id % 4 segment, pos, count(*) n, sum(c) cc
        |  FROM ev GROUP BY 1, 2)
        |SELECT segment, sum(cc)::BIGINT AS clicks,
        |  round(CAST(sum(CAST(n::DOUBLE * ctr AS DECIMAL(38,15))) AS DOUBLE), 6)
        |    AS expected,
        |  round(sum(cc)::DOUBLE /
        |    CAST(sum(CAST(n::DOUBLE * ctr AS DECIMAL(38,15))) AS DOUBLE), 6) AS coec
        |FROM seg JOIN curve USING (pos) GROUP BY segment ORDER BY segment""".stripMargin,
    "q368_rec_holdout_eval" ->
      """WITH li AS (SELECT l_orderkey, l_partkey p FROM lineitem),
        |oy AS (SELECT o_orderkey, o_custkey c, year(o_orderdate) yr FROM orders),
        |trainp AS (SELECT DISTINCT oy.c, li.p FROM oy
        |  JOIN li ON li.l_orderkey = oy.o_orderkey WHERE yr < 1999),
        |testp AS (SELECT DISTINCT oy.c, li.p FROM oy
        |  JOIN li ON li.l_orderkey = oy.o_orderkey WHERE yr >= 1999),
        |trainbp AS (SELECT DISTINCT oy.o_orderkey o, li.p FROM oy
        |  JOIN li ON li.l_orderkey = oy.o_orderkey WHERE yr < 1999),
        |capped AS (SELECT o, p FROM (SELECT o, p, row_number() OVER
        |    (PARTITION BY p ORDER BY
        |      ('0x' || substr(md5('rh|' || o || '|' || p), 1, 15))::BIGINT, o) r
        |  FROM trainbp) WHERE r <= 64),
        |pairs AS (SELECT a.p u, b.p v, count(*) cc FROM capped a JOIN capped b
        |  ON a.o = b.o AND a.p <> b.p GROUP BY 1, 2),
        |sim AS (SELECT u, v, cc FROM (SELECT u, v, cc,
        |    row_number() OVER (PARTITION BY u ORDER BY cc DESC, v) r FROM pairs)
        |  WHERE r <= 20),
        |cand AS (SELECT tp.c, s.v, sum(s.cc) score
        |  FROM trainp tp JOIN sim s ON s.u = tp.p GROUP BY tp.c, s.v),
        |cand2 AS (SELECT c, v, score FROM cand
        |  WHERE NOT EXISTS (SELECT 1 FROM trainp x WHERE x.c = cand.c AND x.p = cand.v)),
        |recs AS (SELECT c, v FROM (SELECT c, v,
        |    row_number() OVER (PARTITION BY c ORDER BY score DESC, v) r FROM cand2)
        |  WHERE r <= 3),
        |evalu AS (SELECT DISTINCT r.c FROM recs r JOIN testp t ON t.c = r.c),
        |recse AS (SELECT r.c, r.v FROM recs r JOIN evalu USING (c)),
        |hits AS (SELECT r.c, count(*) nh FROM recse r
        |  JOIN testp t ON t.c = r.c AND t.p = r.v GROUP BY r.c),
        |peru AS (SELECT r.c, count(*) nr FROM recse r GROUP BY r.c),
        |pert AS (SELECT t.c, count(*) nt FROM testp t JOIN evalu USING (c) GROUP BY t.c),
        |u AS (SELECT p.c, p.nr, coalesce(h.nh, 0) nh, t.nt
        |  FROM peru p LEFT JOIN hits h USING (c) JOIN pert t USING (c))
        |SELECT count(*)::BIGINT AS n_eval_users, sum(nh)::BIGINT AS n_hits,
        |  round(sum(CASE WHEN nh > 0 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6)
        |    AS hit_rate_3,
        |  round(sum(nh)::DOUBLE / sum(nt)::DOUBLE, 6) AS recall_3,
        |  round(sum(nh)::DOUBLE / sum(nr)::DOUBLE, 6) AS precision_3
        |FROM u""".stripMargin,
    "q369_gmm_em_step" ->
      """WITH x AS (SELECT value x FROM events),
        |mom AS (SELECT count(*) n,
        |    CAST(sum(CAST(x AS DECIMAL(38,15))) AS DOUBLE) sx,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,15))) AS DOUBLE) sxx
        |  FROM x),
        |init AS (SELECT n, sx / n::DOUBLE m,
        |    sqrt((sxx - sx * sx / n::DOUBLE) / n::DOUBLE) sd FROM mom),
        |e AS (SELECT x, m - sd mu1, m + sd mu2, sd,
        |    1.0 / (1.0 + exp((((x - (m + sd)) * (x - (m + sd))) -
        |      ((x - (m - sd)) * (x - (m - sd)))) / (2.0 * sd * sd))) r2
        |  FROM x CROSS JOIN init),
        |mstep AS (SELECT count(*) n,
        |    CAST(sum(CAST(r2 AS DECIMAL(38,15))) AS DOUBLE) sr2,
        |    CAST(sum(CAST(r2 * x AS DECIMAL(38,15))) AS DOUBLE) sr2x,
        |    CAST(sum(CAST((1.0 - r2) * x AS DECIMAL(38,15))) AS DOUBLE) sr1x
        |  FROM e)
        |SELECT n::BIGINT AS n, round(1.0 - sr2 / n::DOUBLE, 6) AS w1,
        |  round(sr2 / n::DOUBLE, 6) AS w2,
        |  round(sr1x / (n::DOUBLE - sr2), 6) AS mu1_new,
        |  round(sr2x / sr2, 6) AS mu2_new
        |FROM mstep""".stripMargin,
    "q370_posting_compression" ->
      """WITH posting AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id,
        |    unnest(str_split(text, ' ')) w FROM documents) WHERE len(w) > 0),
        |gaps AS (SELECT w,
        |    coalesce(doc_id - lag(doc_id) OVER (PARTITION BY w ORDER BY doc_id),
        |      doc_id + 1) g
        |  FROM posting),
        |bits AS (SELECT w, 2 * (len(bin(g)) - 1) + 1 bits FROM gaps)
        |SELECT w AS term, count(*)::BIGINT AS df,
        |  sum(bits)::BIGINT AS gamma_bits,
        |  round(sum(bits)::DOUBLE / (count(*) * 64)::DOUBLE, 6) AS vs_raw64
        |FROM bits GROUP BY w ORDER BY gamma_bits DESC, term LIMIT 10""".stripMargin)
}
