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

  /** Bloom-prefiltered semi-join: the explicit runtime-filter pattern.
    *
    * At 100 TB the expensive part of `big SEMI JOIN small` is shuffling
    * the big side; a Bloom filter over the small side's keys, broadcast
    * to the scan, drops most non-matching rows BEFORE the shuffle. The
    * final equi-join removes Bloom false positives, so the result is
    * row-identical to the plain semi-join (no false negatives by
    * construction) — which is exactly what the oracle checks.
    *
    * Built declaratively, no UDAF and no driver collect:
    *  - build: k hash positions per key (xxhash64 seeded by probe
    *    index), explode → partial-aggregable `bit_or` per 64-bit word →
    *    one map<word,bits> row. Σ size ≤ mBits/8 bytes (8 KiB default).
    *  - probe: broadcast-hash-join the single bloom row on a constant
    *    key (BHJ stays in whole-stage codegen, unlike a cross join's
    *    BroadcastNestedLoopJoin which runs interpreted), then test all
    *    k bits with element_at + bit masks — pure codegen'd scan work.
    *
    * Spark's own AQE injects this shape for some joins
    * (spark.sql.optimizer.runtime.bloomFilter.enabled); the explicit
    * operator covers the pipeline cases the planner can't see, e.g.
    * decontaminating a corpus against a fingerprint blocklist where the
    * "join" is buried behind library composition.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      mBits: Int = 1 << 16, numHashes: Int = 3): DataFrame =
    bloomProbe(big, bigKey, small, smallKey, mBits, numHashes)
      .filter(col("__may")).drop("__may")
      .join(small.select(col(smallKey)).distinct(),
        col(bigKey) === col(smallKey), "left_semi")

  /** Bloom-prefiltered ANTI join — the incremental-ingest shape: "drop
    * new docs whose fingerprint already exists in the corpus". The
    * Bloom filter works in the opposite direction from the semi-join:
    * a row that MISSES the filter is a guaranteed non-member (no false
    * negatives) and passes through with no join at all; only the
    * Bloom-hit sliver takes the exact anti-join that clears false
    * positives. At 100 TB that means the shuffle carries ~|matches| +
    * ε·|big| rows instead of |big|.
    *
    * The big side feeds both branches, so the plan scans it twice
    * (scan-heavy) rather than shuffling it whole (shuffle-heavy) — the
    * right trade when the corpus-side scan is cheap columnar pruning
    * and the ingest batch is the small side, as in ingest pipelines.
    * Result is row-identical to a plain left_anti join.
    */
  def bloomAntiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      mBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    val probed = bloomProbe(big, bigKey, small, smallKey, mBits, numHashes)
    val definiteMiss = probed.filter(!col("__may")).drop("__may")
    val needExact = probed.filter(col("__may")).drop("__may")
      .join(small.select(col(smallKey)).distinct(),
        col(bigKey) === col(smallKey), "left_anti")
    definiteMiss.unionByName(needExact)
  }

  /** Always 0, but NOT foldable (spark_partition_id is marked
    * non-deterministic): an equi-join on it survives constant folding
    * as a BroadcastHashJoin, where a `lit = lit` condition would fold
    * to `true` and degrade to a BroadcastNestedLoopJoin — whose join
    * condition (and any filter pushed into it) runs interpreted,
    * outside whole-stage codegen.
    */
  private def constantZero: Column = spark_partition_id() * lit(0)

  /** Shared Bloom build+probe: returns `big` plus a boolean `__may`
    * column (true ⇔ the key may be in `small`; false ⇔ definitely not).
    */
  private def bloomProbe(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      mBits: Int, numHashes: Int): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(numHashes > 0, "numHashes must be positive")
    val seeds = 0 until numHashes
    def positions(key: Column): Seq[Column] =
      seeds.map(i => pmod(xxhash64(lit(i), key), lit(mBits.toLong)))
    val bloom = small
      .select(explode(array(positions(col(smallKey)): _*)).as("__pos"))
      .select((col("__pos") / 64).cast("int").as("__word"),
        (col("__pos") % 64).cast("int").as("__bit"))
      .groupBy("__word")
      .agg(bit_or(call_function("shiftleft", lit(1L), col("__bit"))).as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__word"), col("__bits"))))
        .as("__bloom"))
      .withColumn("__one", constantZero)
    val mayMatch = positions(col(bigKey)).map { pos =>
      val word = (pos / 64).cast("int")
      val mask = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      coalesce(try_element_at(col("__bloom"), word), lit(0L)).bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
    // An empty small side still yields ONE bloom row (global aggregate)
    // holding an empty map: every probe misses, `__may` is false
    // everywhere, and both callers degrade to the correct empty/pass-all
    // behavior without a special case.
    big.withColumn("__one", constantZero)
      .join(broadcast(bloom), Seq("__one"))
      .withColumn("__may", mayMatch)
      .drop("__bloom", "__one")
  }

  /** Binned range join: points ⋈ intervals on lo ≤ p ≤ hi WITHOUT the
    * nested-loop plan Spark gives a pure inequality join (interpreted
    * BroadcastNestedLoopJoin, O(|points|·|intervals|) comparisons).
    *
    * Both sides are binned at `binWidth`: a point lands in exactly ONE
    * bin; an interval replicates to each bin it overlaps
    * (explode(sequence(floor(lo/w), floor(hi/w)))). The join is then a
    * plain shuffled/broadcast HASH join on the bin id plus the exact
    * residual filter — each matching pair meets exactly once (in the
    * point's bin), so no dedup is needed. Shuffle volume is
    * |points| + |intervals|·(span/binWidth + 1); pick binWidth near the
    * median interval span. This is the standard engine-level
    * range-join-binning optimization, expressed compositionally.
    */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
