package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Laws for the Hilbert-curve index (wave 25): the Column form must
  * match a plain-Scala reference point-for-point, the curve must be a
  * bijection, and consecutive indexes must be grid NEIGHBORS — the
  * no-jump property that is the whole reason to prefer Hilbert over
  * the Z-curve for layout (q434 measures the zonemap consequence).
  */
class HilbertSpec extends SparkSpec {

  /** Scalar xy→d reference (Hamilton's iterative form). */
  private def ref(x0: Long, y0: Long, order: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("native hilbertValue matches the scalar reference AND the column unroll, bijectively") {
    import spark.implicits._
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), 4).as("d"),
        Layout.hilbertValueUnrolled(col("x"), col("y"), 4).as("du"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 4),
        s"native vs scalar at (${r.getLong(0)},${r.getLong(1)}): got ${r.getLong(2)}")
      assert(r.getLong(3) == r.getLong(2),
        s"unrolled vs native at (${r.getLong(0)},${r.getLong(1)})")
    }
    assert(got.map(_.getLong(2)).toSet == (0L until 256L).toSet, "not a bijection")
  }

  test("no-jump property: consecutive Hilbert indexes are always grid neighbors") {
    val byD = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (ref(x, y, 4), x, y)).sortBy(_._1).toIndexedSeq
    byD.sliding(2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(math.abs(a._2 - b._2) + math.abs(a._3 - b._3) == 1,
        s"jump between d=${a._1} (${a._2},${a._3}) and d=${b._1} (${b._2},${b._3})")
    }
  }

  test("hilbertSqlCtes carries every round's constants (drift tripwire vs the Column form)") {
    val sql = Layout.hilbertSqlCtes("src", "xx", "yy", 8, Seq("xx", "yy"))
    // one stage per round, each with the round's quadrant size s and
    // area s*s — the same constants the Column loop uses
    for (i <- 0 until 8) {
      val s = 1L << (7 - i)
      assert(sql.contains(s"h${i + 1} AS"), s"missing stage ${i + 1}")
      assert(sql.contains(s"+ ${s * s} * xor"), s"missing area term ${s * s}")
    }
    assert(sql.contains("hout AS"), "missing final projection stage")
  }
}
