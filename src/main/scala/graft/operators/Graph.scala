package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Link-graph centrality for corpus curation.
  *
  * Web-scale training-data pipelines rank pages/domains by link (or
  * clickstream-transition) centrality and use the score as a quality
  * prior — the classic curation signal alongside text-quality
  * heuristics. The operator here is plain iterative PageRank over an
  * edge-list DataFrame; graph construction (hyperlinks, session
  * transitions, citation edges) is the caller's.
  */
object Graph {

  /** Iterative PageRank with uniform teleport and dangling-mass
    * redistribution:
    *
    *   rank'(v) = (1-d)/N + d·( Σ_{u→v} rank(u)/deg(u) + M/N )
    *
    * where M is the total rank held by dangling nodes (no out-edges).
    *
    * Scale shape, per round: one equi-join of the edge list against
    * the rank table on the source id, then ONE partial-aggregable
    * aggregation — the node table rides the contribution stream as
    * zero-contribution rows carrying the degree, so the
    * per-destination decimal sum and the join-back-to-nodes collapse
    * into a single groupBy. All hash-partitioned on node id, nothing
    * quadratic, nothing on the driver (the two per-round scalars, N
    * and M, ride an
    * `observe()` metric on the action that materializes the round, so
    * convergence bookkeeping costs zero extra jobs — same pattern as
    * [[Dedup.nearDupClusters]]). Each superseded round is unpersisted
    * immediately; lineage stays flat. On a production cluster the
    * edge list would be bucketed by src to amortize its per-round
    * exchange; here it is persisted once and re-shuffled per round.
    *
    * Numerics are engine-reproducible by construction: ranks live as
    * DECIMAL(30,12) (the cast IS the per-round rounding), per-edge
    * contributions are computed in double and summed exactly in
    * decimal, so partition order cannot perturb the result and an
    * oracle following the same formula matches bit-for-bit.
    *
    * Edge multiplicity is respected (parallel edges contribute
    * twice); dedup first if the graph is simple. Returns (id, rank)
    * with rank as DOUBLE.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val dec = DecimalType(30, 12)
    // Cache the edge list HASH-PARTITIONED ON src: every round joins it
    // against the rank table on src=id, and the rank table itself comes
    // out of the previous round's groupBy(id) hash-partitioned the same
    // way — with both cached partitionings aligned the per-round join
    // plans with NO exchange (guide §2.4: operations keyed the same way
    // share one exchange; the bucketed-by-src layout the operator doc
    // already prescribes for a real cluster, done in-memory here). The
    // one remaining exchange per round is the inherent src→dst
    // contribution shuffle in the groupBy.
    val width = edges.sparkSession.sessionState.conf.numShufflePartitions
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(width, col("src"))
      .persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val obsBase = new Observation("pr_base")
    val base = nodes.join(outDeg, Seq("id"), "left")
      .observe(obsBase, count(lit(1)).as("n"),
        sum(when(col("deg").isNull, 1L).otherwise(0L)).as("n_dangling"))
      .persist()
    base.count()
    val n = (obsBase.get("n"): @unchecked) match { case x: Number => x.doubleValue }
    val nDangling = (obsBase.get("n_dangling"): @unchecked) match {
      case x: Number => x.longValue
      case null => 0L
    }
    if (n == 0) { // empty edge list: no nodes, no ranks (avoid 1/0 -> NaN)
      base.unpersist(); e.unpersist()
      return edges.sparkSession.range(0)
        .select(col("id"), lit(0.0).as("rank"))
    }

    // init: uniform 1/N, cast (= rounded) to the decimal rank domain
    var ranks = base
      .select(col("id"), col("deg"), lit(1.0 / n).cast(dec).as("rank"))
      .persist()
    // dangling mass of the uniform init: nDangling exact copies of the
    // same 12-dp decimal — exact decimal product, then one double cast,
    // matching what sum(rank) over the dangling rows computes
    var mass = (java.math.BigDecimal.valueOf(1.0 / n)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .multiply(java.math.BigDecimal.valueOf(nDangling))).doubleValue

    var i = 0
    while (i < iters) {
      // one join + ONE aggregation per round: the node table rides the
      // contribution stream as zero-contribution rows carrying the
      // degree, so the per-destination sum and the join-back-to-nodes
      // collapse into a single groupBy (first(deg) picks the unique
      // non-null degree; every node appears exactly once on the base
      // side, so no destination is lost and dangling nodes keep a
      // null degree)
      val contrib = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst").as("id"), lit(null).cast("long").as("deg"),
          (col("rank").cast(DoubleType) / col("deg")).cast(dec).as("c"))
      val obs = new Observation(s"pr_round_$i")
      val next = contrib
        .unionByName(base.select(col("id"), col("deg"), lit(null).cast(dec).as("c")))
        .groupBy("id")
        .agg(first(col("deg"), ignoreNulls = true).as("deg"), sum(col("c")).as("cs"))
        .select(col("id"), col("deg"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("cs").cast(DoubleType), lit(0.0)) + lit(mass / n)))
            .cast(dec).as("rank"))
        .observe(obs,
          sum(when(col("deg").isNull, col("rank")).otherwise(lit(null).cast(dec)))
            .as("dangling_mass"))
        .persist()
      next.count()
      mass = (obs.get("dangling_mass"): @unchecked) match {
        case x: java.math.BigDecimal => x.doubleValue
        case x: Number => x.doubleValue
        case null => 0.0
      }
      ranks.unpersist()
      ranks = next
      i += 1
    }
    Materialize.spillRelease(
      ranks.select(col("id"), col("rank").cast(DoubleType).as("rank")),
      Seq(ranks, base, e): _*)
  }

  /** Multi-source BFS: exact hop distances (0..maxHop) from every seed
    * over a directed edge list. One keyed join per round expands the
    * frontier; a left-anti join against the visited set keeps state at
    * (seed, node) pairs — never paths — so each round is a bounded
    * shuffle regardless of fan-out, and first-reach order gives the
    * min-hop distance by construction.
    *
    * `edges`: columns (u, v); `seeds`: column (sd). Returns
    * (sd, node, hop) with hop the shortest distance ≤ maxHop.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHop: Int): DataFrame = {
    require(maxHop >= 0, s"maxHop must be >= 0, got $maxHop")
    // Per-round persist (the PageRank discipline): the visited set and
    // edge list are re-read every round; without persistence each round
    // re-executes the whole prefix DAG (~3× per level of nesting).
    // spillRelease at the end returns an unencumbered frame and leaves
    // the block manager clean.
    val e = edges.persist()
    val d0 = seeds.select(col("sd"), col("sd").as("node"), lit(0L).as("hop")).persist()
    val rounds = scala.collection.mutable.Buffer[DataFrame](d0)
    var frontier = d0
    var visited = d0.select("sd", "node")
    for (h <- 1 to maxHop) {
      val nxt = frontier.select(col("sd"), col("node"))
        .join(e, col("node") === col("u"))
        .select(col("sd"), col("v").as("node")).distinct()
        .join(visited, Seq("sd", "node"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .persist()
      nxt.count(): Unit
      rounds += nxt
      visited = visited.unionByName(nxt.select("sd", "node"))
      frontier = nxt
    }
    Materialize.spillRelease(
      rounds.reduce(_.unionByName(_)), (e +: rounds.toSeq): _*)
  }
}
