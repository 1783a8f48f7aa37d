package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.Curation55

/** Laws for the round-11 wave-24 operators: sign-bit quantized search,
  * Croston smoothing, successive halving.
  */
class Wave24Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("signBitTopK with a corpus-wide shortlist equals exact brute force") {
    // candidates >= |corpus| makes the Hamming stage a no-op filter, so
    // the rerank must reproduce bruteForceTopK EXACTLY (same rank keys,
    // same tie-breaks) — the quantizer can only ever shrink the
    // candidate set, never change the scoring.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("qid", "rank", "nid").collect().toSet
    val full = Similarity.signBitTopK(e, q, "vec_id", "embedding",
        k = 5, candidates = 1000000)
      .select("qid", "rank", "nid").collect().toSet
    assert(exact.nonEmpty && full == exact)
  }

  test("sign-bit packing: known vectors pack to the expected words") {
    import spark.implicits._
    // component j >= 0 sets bit (j-1) of the low word for j<=32, bit
    // (j-33) of the high word above — alternating signs = 0x55555555
    val alternating = Array.tabulate(64)(j => if (j % 2 == 0) 1.0f else -1.0f)
    val allNeg = Array.fill(64)(-1.0f)
    val df = Seq((1L, alternating), (2L, allNeg)).toDF("vec_id", "embedding")
    // pack via the operator's public surface: a self-join where the
    // shortlist score of identical vectors must be dim (all bits equal)
    // and of opposite vectors must be -dim
    val r = Similarity.signBitTopK(df, df.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 1, candidates = 1)
      .select("qid", "nid", "ham_sim").collect()
    // the only other row (allNeg) differs from alternating in the 32
    // positive positions: ham_sim = 64 - 2*32 = 0
    assert(r.length == 1 && r(0).getLong(1) == 2L)
    assert(r(0).getInt(2) == 0)
  }

  test("Croston law: constant sizes and gaps smooth to exactly that size and gap") {
    import spark.implicits._
    // 6 demand days of size 10.00 every 3 days: weights sum to 1, so
    // z_hat = 10, p_hat = 3, forecast = 10/3
    val days = (0 until 6).map(i => java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(3L * i)))
    val dd = days.map(dy => ("a", dy, BigDecimal("10.00"))).toDF("event_type", "day", "z")
      .withColumn("z", col("z").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
    val r = Curation55.crostonAgg(dd).collect()(0)
    assert(r.getLong(1) == 6L)
    assert(math.abs(r.getDouble(2) - 10.0) < 1e-6, s"z_hat ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-6, s"p_hat ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 10.0 / 3.0) < 1e-5)
  }

  test("successive halving: monotone containment 16 -> 8 -> 4 -> 2 -> 1 winner") {
    val r = SparkEntry.queries("q430_successive_halving")(spark, sf)
      .select("stage", "arm", "kept").collect()
    val byStage = r.groupBy(_.getInt(0)).view.mapValues(_.map(x =>
      (x.getLong(1), x.getInt(2))).toMap).toMap
    assert(byStage(1).size == 16 && byStage(2).size == 8 &&
      byStage(3).size == 4 && byStage(4).size == 2)
    // arms present at stage s+1 are exactly the kept arms of stage s
    for (s <- 1 to 3)
      assert(byStage(s + 1).keySet == byStage(s).filter(_._2 == 1).keySet,
        s"stage ${s + 1} arms != stage $s keeps")
    assert(byStage(4).values.count(_ == 1) == 1)
  }
}
