package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.Curation33

/** Semantics pins for the round-8 wave-3 statistics. */
class Curation33Spec extends SparkSpec {

  test("Krippendorff alpha matches the hand-computed nominal example") {
    // 4 units × 3 raters: u1 aaa, u2 aab, u3 bbb, u4 bbb.
    // D_o = (1/12)·Σ(9−Σn²)/2 = (1/12)·2 = 1/6; marginals a=5 b=7 ⇒
    // D_e = (144−74)/(12·11) = 70/132; alpha = 1 − 22/70 = 0.685714.
    import spark.implicits._
    val ratings = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"),
      (4L, "b"), (4L, "b"), (4L, "b")).toDF("doc_id", "r")
    val row = Curation33.krippendorffAlpha(ratings).collect().head
    assert(row.getAs[Long]("n_units") === 4L)
    assert(row.getAs[Long]("n_tot") === 12L)
    assert(row.getAs[Double]("alpha") === 0.685714)
  }

  test("Krippendorff alpha is 1 under perfect agreement") {
    import spark.implicits._
    val ratings = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b"), (2L, "b")).toDF("doc_id", "r")
    val row = Curation33.krippendorffAlpha(ratings).collect().head
    assert(row.getAs[Double]("alpha") === 1.0)
  }

  test("U-shaped attribution weights sum to 1 per purchase for 1..5 touches") {
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // purchases at minute 30 for five users; user u has u touches
    val purchases = (1 to 5).map(u =>
      (100L + u, u.toLong, ts(30), 10.0)).toDF("p_id", "p_user", "p_ts", "p_value")
    val touches = (1 to 5).flatMap(u => (1 to u).map(i =>
      (u * 10L + i, u.toLong, ts(i), "click"))).toDF("t_id", "t_user", "t_ts", "t_type")
    val credits = Curation33.uShapedCredits(purchases, touches)
    val sums = credits.groupBy("p_id")
      .agg(round(sum(col("wt")), 9).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Double]("s"),
        r.getAs[Long]("n"))).sortBy(_._1)
    assert(sums.map(_._3).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(sums.forall(_._2 === 1.0), s"weights must conserve: ${sums.toSeq}")
    // first/last get 0.4 when n≥2, interior shares 0.2
    val u4 = credits.filter(col("p_user") === 4).orderBy("rn")
      .select("wt").collect().map(_.getDouble(0))
    assert(u4.toSeq === Seq(0.4, 0.1, 0.1, 0.4))
  }
}
