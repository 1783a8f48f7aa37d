package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.GraftFunctions.{dotProduct, normSq}
import graft.functions.TextFunctions.mdHash

/** Approximate / exact nearest-neighbor search over embedding columns.
  *
  * Two tiers, per the scale plan:
  *  - [[bruteForceTopK]]: exact cosine top-k of a (small, broadcast)
  *    query set against the full corpus — one scan of the corpus, no
  *    corpus-side shuffle except the per-query top-k.
  *  - [[hyperplaneBucket]] + [[lshNearDupPairs]]: random-hyperplane LSH.
  *    Bucket id = sign pattern of `nPlanes` pseudo-random ±1 hyperplanes
  *    (derived from the cross-engine md5 hash, so the oracle can
  *    replicate them). Candidates are bucket-colliding pairs only —
  *    the O(n²) term drops to Σ bucket².
  */
object Similarity {

  private def asDouble(vecCol: String) =
    transform(col(vecCol), x => x.cast(DoubleType))

  /** Exact cosine top-k: for each query row, the k nearest corpus rows
    * (excluding itself). Ranking key rounds the similarity to 9 dp with
    * an id tie-break, making the cutoff deterministic across engines and
    * partitionings.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(vecCol).as("e_n"))
    val q = queries.select(col(idCol).as("qid"), asDouble(vecCol).as("e_q"))
    val w = Window.partitionBy("qid")
      .orderBy(round(col("cos"), 9).desc, col("nid").asc)
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dotProduct(col("e_q"), col("e_n")) /
          sqrt(normSq(col("e_q")) * normSq(col("e_n")))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id (0 .. 2^nPlanes-1). Plane p's j-th
    * component is ±1 from bit 0 of mdHash("p,j") — deterministic and
    * engine-reproducible; production would broadcast a precomputed
    * plane matrix instead of hashing per element.
    */
  def hyperplaneBucket(vec: org.apache.spark.sql.Column, dim: Int, nPlanes: Int)
      : org.apache.spark.sql.Column = {
    val planeDots = transform(
      sequence(lit(0), lit(nPlanes - 1)),
      p => aggregate(
        sequence(lit(1), lit(dim)),
        lit(0.0),
        (acc, j) => acc + element_at(vec, j) *
          when(pmod(mdHash(concat(p.cast("string"), lit(","), j.cast("string"))), lit(2)) === 1, 1.0)
            .otherwise(-1.0)))
    aggregate(
      zip_with(planeDots, sequence(lit(0), lit(nPlanes - 1)),
        (dot, p) => when(dot >= 0, pow(lit(2.0), p.cast(DoubleType)).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** LSH-bucketed near-duplicate pairs: cosine ≥ threshold among pairs
    * colliding in the hyperplane bucket. The scale path for
    * [[Dedup.cosineNearDupPairs]].
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int, threshold: Double): DataFrame = {
    val e = df.select(col(idCol).as("id"), asDouble(vecCol).as("e"))
      .withColumn("bucket", hyperplaneBucket(col("e"), dim, nPlanes))
    val a = e.select(col("bucket"), col("id").as("id_a"), col("e").as("e_a"))
    val b = e.select(col("bucket"), col("id").as("id_b"), col("e").as("e_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("bucket"),
        (dotProduct(col("e_a"), col("e_b")) /
          sqrt(normSq(col("e_a")) * normSq(col("e_b")))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
