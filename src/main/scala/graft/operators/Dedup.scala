package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every operator is shuffle-bounded by the number of
  * *candidate* rows, never O(n²) over the corpus —
  *  - exact dedup: one hash-partitioned aggregation on the content hash;
  *  - MinHash-LSH: signatures computed per-row (no shuffle), then one
  *    explode-by-band + self-equi-join on (band, key) — the join only
  *    materializes colliding candidates;
  *  - SimHash: per-row 64→16-bit sketch, grouped exactly.
  * Brute-force pairwise Jaccard is provided only behind a blocking key.
  */
object Dedup {

  /** Exact dedup on a content hash: keeps the smallest id per distinct
    * content. Returns (contentHash, keptId, nCopies).
    */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_copies"))

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline: per-row shingles → per-row MinHash signature (numHashes
    * seeded 60-bit hashes) → explode into `bands` band keys → self-join
    * on (band, key) → distinct candidate pairs → exact Jaccard filter.
    * Pair collision probability ≈ 1-(1-J^rowsPerBand)^bands.
    *
    * Returns (id_a, id_b, jac) with id_a < id_b and jac ≥ threshold.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 48, bands: Int = 12): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val sh = df.select(
      col(idCol).as("id"),
      wordShingles(words(col(textCol)), 3).as("sh"))
    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("id"), col("sh"),
        posexplode(bandKeys(col("sig"), bands, rowsPerBand)).as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .distinct()
      .filter(col("jac") >= threshold)
  }

  /** SimHash groups: docs sharing an identical 16-bit sketch (duplicate
    * clusters). Returns (simhash, n_docs, min_id) for groups of ≥ 2.
    */
  def simhashGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .withColumn("sh16", simhash16("w"))
      .groupBy("sh16")
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("min_id"))
      .filter(col("n_docs") >= 2)

  /** Brute-force n-gram Jaccard pairs within a blocking key (e.g. lang).
    * The blocking key bounds the quadratic term to the largest block;
    * for unblocked corpora use [[minhashLshPairs]].
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = df.select(
      col(blockCol).as("blk"), col(idCol).as("id"),
      wordShingles(words(col(textCol)), n).as("sh"))
    val a = sh.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Embedding near-duplicate pairs by cosine ≥ threshold, brute force
    * (non-equi join — Spark plans a broadcast nested-loop with the
    * smaller side broadcast). Baseline for [[Similarity.lshNearDupPairs]],
    * which is the 100 TB path.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("e"))
    val a = e.select(col("id").as("id_a"), col("e").as("e_a"))
    val b = e.select(col("id").as("id_b"), col("e").as("e_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (graft.functions.GraftFunctions.dotProduct(col("e_a"), col("e_b")) /
          sqrt(graft.functions.GraftFunctions.normSq(col("e_a")) *
            graft.functions.GraftFunctions.normSq(col("e_b")))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
