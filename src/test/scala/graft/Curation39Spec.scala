package graft

import org.apache.spark.sql.functions._

import graft.queries.Curation39

/** The q356 KNN-Shapley window closed form claims s_j = Σ_{i≥j} c_i
  * equals the published recurrence s_N = u_N/N,
  * s_j = s_{j+1} + (u_j − u_{j+1})/K · min(K,j)/j (Jia et al. 2019,
  * K=5). This spec pins the DataFrame construction against a direct
  * sequential-loop implementation on hand-built neighbor orderings.
  */
class Curation39Spec extends SparkSpec {

  /** Reference: run the recurrence literally, farthest to nearest. */
  private def loopShapley(u: Seq[Double], k: Int = 5): Seq[Double] = {
    val n = u.length
    val s = Array.ofDim[Double](n)
    s(n - 1) = u(n - 1) / n
    for (j <- n - 2 to 0 by -1) {
      val rank = j + 1 // 1-based rank of this neighbor
      s(j) = s(j + 1) + (u(j) - u(j + 1)) / k.toDouble *
        math.min(k, rank).toDouble / rank.toDouble
    }
    s.toSeq
  }

  test("window closed form equals the sequential recurrence") {
    import spark.implicits._
    // two test points with different match patterns; dp descending
    // encodes the nearest-first order (rank 1 = highest dp).
    val uA = Seq(1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0)
    val uB = Seq(0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    val rows =
      uA.zipWithIndex.map { case (u, i) => (1L, 100L + i, (100 - i).toDouble, u) } ++
      uB.zipWithIndex.map { case (u, i) => (2L, 200L + i, (100 - i).toDouble, u) }
    val pairs = rows.toDF("tid", "vec_id", "dp", "u")
    val got = Curation39.knnShapley(pairs)
      .orderBy("tid", "vec_id")
      .select(col("tid"), col("s")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val want = loopShapley(uA).map((1L, _)) ++ loopShapley(uB).map((2L, _))
    got.zip(want).foreach { case ((gt, gs), (wt, ws)) =>
      assert(gt == wt)
      assert(math.abs(gs - ws) < 1e-12, s"tid $gt got $gs want $ws")
    }
  }

  test("all-match neighbors value the nearest K highest") {
    import spark.implicits._
    // u ≡ 1: every delta is 0, so all points get the tail value 1/N —
    // and efficiency holds: Σ s_j = 1 (the classifier is always right).
    val pairs = (0 until 10).map(i => (7L, i.toLong, (50 - i).toDouble, 1.0))
      .toDF("tid", "vec_id", "dp", "u")
    val s = Curation39.knnShapley(pairs).select(col("s"))
      .collect().map(_.getDouble(0))
    s.foreach(v => assert(math.abs(v - 0.1) < 1e-12))
    assert(math.abs(s.sum - 1.0) < 1e-12)
  }
}
