package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** The reference-verb façade: the Criteo demo written the way a
  * reference user would port it (SURVEY.md §7).
  */
class OpsSyntaxSpec extends SparkSpec {

  test("criteo pipeline through the façade verbs") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Long])]((Some(1382L), Some(2L)), (None, None))
      .toDF("dense1", "dense3")
    val out = df
      .withColumn("dense1", ($"dense1".fillNull(0L) + 3).ln)
      .withColumn("p", (lit(1.0) / ($"dense3".fillNull(0L) + 3)).logit)
      .collect()
    assert(math.abs(out(0).getDouble(0) - math.log(1385.0)) < 1e-12)
    assert(math.abs(out(1).getDouble(0) - math.log(3.0)) < 1e-12)
    assert(math.abs(out(0).getDouble(2) - math.log((1.0 / 5) / (1 - 1.0 / 5))) < 1e-12)
  }

  test("logit with eps clamps into [eps, 1-eps]") {
    import spark.implicits._
    val out = Seq(0.0, 1.0).toDF("p")
      .select($"p".logit(1e-6).as("l")).collect().map(_.getDouble(0))
    assert(math.abs(out(0) + math.log((1 - 1e-6) / 1e-6)) < 1e-6)
    assert(math.abs(out(1) - math.log((1 - 1e-6) / 1e-6)) < 1e-6)
  }

  test("fillNullAll broadcasts over all numeric columns (struct-wide fill)") {
    import spark.implicits._
    val df = Seq[(Option[Double], Option[Double])]((Some(1.0), None), (None, Some(2.0)))
      .toDF("a", "b")
    val out = df.fillNullAll(0).collect()
    assert(out(0).getDouble(1) == 0.0 && out(1).getDouble(0) == 0.0)
  }

  test("transformList preserves shape and nulls (velox transform)") {
    import spark.implicits._
    val out = Seq(Seq[Option[Long]](Some(1L), None)).toDF("xs")
      .transformList("xs", _ * 5)
      .collect()(0).getSeq[Any](0)
    assert(out == Seq(5L, null))
  }

  test("sliceRows = ordered contiguous range") {
    import spark.implicits._
    val out = spark.range(50).toDF("i")
      .sliceRows(Seq($"i".asc), 5, 3).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(5L, 6L, 7L))
  }
}
