package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws from SURVEY.md §5.3 (raw scalacheck generators,
  * fixed seeds for reproducibility): slice composition, set-op
  * cardinalities, the velox transform law.
  */
class PropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("slice composition: offset(a).limit(40).offset(c) == offset(a+c).limit(40-c)") {
    import spark.implicits._
    val df = spark.range(200).toDF("i").orderBy("i")
    samples(Gen.zip(Gen.choose(0, 50), Gen.choose(0, 20)), 8).foreach { case (a, c) =>
      val nested = df.offset(a).limit(40).offset(c).collect().map(_.getLong(0)).toSeq
      val direct = df.offset(a + c).limit(40 - c).collect().map(_.getLong(0)).toSeq
      assert(nested == direct, s"a=$a c=$c")
    }
  }

  test("union cardinality and except-removes-all-matches") {
    import spark.implicits._
    val gl = Gen.listOfN(30, Gen.choose(0, 10))
    samples(Gen.zip(gl, Gen.listOfN(20, Gen.choose(0, 10))), 5).foreach { case (xs, ys) =>
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      assert(a.union(b).count() == xs.size + ys.size)
      assert(a.except(b).collect().map(_.getInt(0)).toSet == (xs.toSet -- ys.toSet))
    }
  }

  test("transform ≡ map over rows (velox combinator law)") {
    import spark.implicits._
    samples(Gen.listOfN(15, Gen.choose(-100L, 100L)), 10).foreach { xs =>
      val got = Seq(xs).toDF("xs")
        .select(transform(col("xs"), x => x * 2 + 1).as("ys"))
        .collect()(0).getSeq[Long](0)
      assert(got == xs.map(x => x * 2 + 1))
    }
  }

  test("null propagation: x + NULL = NULL for every numeric op (presence intersection)") {
    import spark.implicits._
    val df = Seq((Some(5L), Option.empty[Long])).toDF("x", "n")
    val r = df.select(
      (col("x") + col("n")).as("add"), (col("x") * col("n")).as("mul"),
      (col("x") / col("n")).as("div"), (col("x") - col("n")).as("sub")).collect()(0)
    (0 to 3).foreach(i => assert(r.isNullAt(i)))
  }

  test("TopK law: ≤ k rows per group, dense ranks from 1, members from the input") {
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(1, 4), Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(-50, 50))))
    samples(gen, 5).foreach { case (k, rows) =>
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g.toLong, v.toLong, i.toLong) }
        .toDF("g", "v", "id").repartition(3)
      val out = graft.operators.TopK.perGroup(df, Seq("g"), Seq(("v", true), ("id", false)), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      val inSet = rows.zipWithIndex.map { case ((g, v), i) => (g.toLong, v.toLong, i.toLong) }.toSet
      out.groupBy(_._1).foreach { case (g, grp) =>
        assert(grp.length <= k, s"k=$k group $g overflowed")
        assert(grp.map(_._4).sorted.toSeq == (1 to grp.length), s"ranks not dense in $g")
      }
      assert(out.forall(r => inSet((r._1, r._2, r._3))), "emitted a row not in the input")
      // rank-1 row IS the group max under (v desc, id asc)
      val best = inSet.groupBy(_._1).view.mapValues(_.toSeq.sortBy(r => (-r._2, r._3)).head).toMap
      out.filter(_._4 == 1).foreach { r =>
        assert(best(r._1) == ((r._1, r._2, r._3)), s"rank-1 mismatch in group ${r._1}")
      }
    }
  }

  test("stratified sampling law: membership is per-row stable under corpus growth") {
    import spark.implicits._
    val docs = (1 to 300).map(i => (i.toLong, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val grown = (1 to 600).map(i => (i.toLong, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    def ids(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sampling.stratified(df, "lang", "id", Map("en" -> 0.4), 0.2)
        .collect().map(_.getLong(0)).toSet
    val small = ids(docs)
    val big = ids(grown)
    // every row of the smaller corpus keeps its membership verdict
    assert(small == big.filter(_ <= 300), "growth must not flip earlier rows")
  }

  test("CDC chunking partitions every document: chunk token counts sum to doc token count") {
    val sf = "/root/testdata/sf0.001"
    val chunks = SparkEntry.queries("q161_cdc_chunks")(spark, sf)
      .groupBy("doc_id")
      .agg(sum(col("n_tokens")).as("chunked"), count(lit(1)).as("n_chunks"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val bad = chunks.join(docs, "doc_id")
      .filter(col("chunked") =!= col("n") || col("n_chunks") < 1)
      .count()
    assert(bad == 0, "chunks must partition each doc exactly (no loss, no overlap)")
  }

  test("temperature mixture never selects more than the language's size, and flattens shares") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q155_temperature_mix")(spark, sf).collect()
    rows.foreach { r =>
      val (selected, nLang) = (r.getLong(1), r.getLong(2))
      assert(selected <= nLang, s"${r.getString(0)}: selected $selected of $nLang")
    }
    // sqrt flattening: selected fraction of a small language >= of a big one
    val fracs = rows.map(r => r.getLong(2) -> r.getLong(1).toDouble / r.getLong(2)).sortBy(_._1)
    assert(fracs.head._2 >= fracs.last._2 - 1e-9,
      s"smallest language must be sampled at >= the biggest one's rate: $fracs")
  }
}
