package graft

import org.apache.spark.sql.functions._

import graft.queries.Curation38

/** The q351 isotonic fit uses the minimax closed form
  * fit_i = max_{j≤i} min_{k≥i} mean(y over bins j..k); this spec pins
  * it against a direct pool-adjacent-violators stack implementation on
  * inputs that force real pooling, plus the monotonicity invariant.
  */
class Curation38Spec extends SparkSpec {

  /** Reference PAV: pool adjacent violating blocks (weighted means),
    * then expand block means back to per-input-bin fits.
    */
  private def pavFits(n: Seq[Long], pos: Seq[Long]): Seq[Double] = {
    case class Block(bins: Int, w: Long, s: Long) {
      def mean: Double = s.toDouble / w.toDouble
    }
    val stack = scala.collection.mutable.Stack[Block]()
    n.zip(pos).foreach { case (w, s) =>
      var b = Block(1, w, s)
      while (stack.nonEmpty && stack.top.mean >= b.mean) {
        val t = stack.pop(); b = Block(t.bins + b.bins, t.w + b.w, t.s + b.s)
      }
      stack.push(b)
    }
    stack.toSeq.reverse.flatMap(b => Seq.fill(b.bins)(b.mean))
  }

  test("minimax isotonic fit equals direct PAV on a pooling-heavy input") {
    import spark.implicits._
    // raw rates 0.8, 0.2, 0.4, 0.9, 0.5, 0.5 with unequal weights —
    // forces a 3-bin pool at the front and a 2-bin pool at the back.
    val n   = Seq(5L, 10L, 5L, 4L, 8L, 2L)
    val pos = Seq(4L, 2L, 2L, 2L, 4L, 1L)
    val binned = n.indices.map(i => (i.toLong, n(i), pos(i))).toDF("bin", "n", "pos")
    val got = Curation38.isotonicFit(binned).orderBy("bin")
      .select(col("iso_rate")).collect().map(_.getDouble(0)).toSeq
    val want = pavFits(n, pos).map(v => math.rint(v * 1e6) / 1e6)
    assert(got == want, s"got $got want $want")
    assert(got == got.sorted, "isotonic fit must be nondecreasing")
  }

  test("already-monotone input is returned unchanged") {
    import spark.implicits._
    val binned = Seq((0L, 10L, 1L), (1L, 10L, 3L), (2L, 10L, 7L))
      .toDF("bin", "n", "pos")
    val got = Curation38.isotonicFit(binned).orderBy("bin")
      .select(col("raw_rate"), col("iso_rate")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    got.foreach { case (raw, iso) => assert(raw == iso) }
  }
}
