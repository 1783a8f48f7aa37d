package graft

import org.apache.spark.sql.functions._

/** DataSource V2 Arrow IPC connector: distributed write → parallel
  * read parity (schema, null masks, CJK strings), column pruning
  * pushed into the reader, overwrite semantics.
  */
class ArrowSourceSpec extends SparkSpec {

  private val fmt = classOf[graft.sources.ArrowSource].getName

  test("arrow DSv2 round-trip preserves rows, nulls, and CJK; one file per partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_arrowds").toString
    val df = Seq(
        (1L, Option("héllo 世界"), 1.5), (2L, None, -0.25), (3L, Option("x"), 0.0),
        (4L, Option(""), 7.25))
      .toDF("id", "s", "v").repartition(2)
    df.write.format(fmt).mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(files.length == 2, "expected one .arrow file per partition")
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s", "v"))
    val got = back.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(got == Set((1L, Some("héllo 世界"), 1.5), (2L, None, -0.25),
      (3L, Some("x"), 0.0), (4L, Some(""), 7.25)))
    // overwrite is rerun-stable
    df.write.format(fmt).mode("overwrite").save(dir)
    assert(spark.read.format(fmt).load(dir).count() == 4)
  }

  test("column pruning reaches the arrow reader") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_arrowds_p").toString
    (1 to 100).map(i => (i.toLong, s"t$i", i * 1.0)).toDF("id", "s", "v")
      .write.format(fmt).mode("overwrite").save(dir)
    val pruned = spark.read.format(fmt).load(dir).select("id")
    assert(pruned.as[Long].collect().sorted.toSeq == (1L to 100L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ArrowScan(id)"),
      s"expected pruned scan description in:\n$plan")
  }

  test("empty partitions write schema-only files that read back as zero rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_arrowds_e").toString
    Seq((1L, "x")).toDF("id", "s").filter(col("id") < 0).repartition(2)
      .write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s") && back.count() == 0)
  }

  test("scan reports file-size statistics: small arrow dim table broadcasts") {
    import spark.implicits._
    val dim = java.nio.file.Files.createTempDirectory("graft_arrowds_d").toString
    (1 to 50).map(i => (i.toLong, s"name$i")).toDF("k", "name")
      .coalesce(1).write.format(fmt).mode("overwrite").save(dim)
    val facts = spark.range(5000).select(col("id"), (col("id") % 50 + 1).as("k"))
    val j = facts.join(spark.read.format(fmt).load(dim), "k")
    assert(j.count() == 5000)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small arrow table must broadcast:\n$plan")
  }

  test("scan is columnar: batches hand over whole, ColumnarToRow in plan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_arrowds_c").toString
    (1 to 10000).map(i => (i.toLong, s"s$i", i * 0.5)).toDF("id", "s", "v")
      .repartition(2)
      .write.format(fmt).mode("overwrite").save(dir)
    val q = spark.read.format(fmt).load(dir)
      .groupBy(org.apache.spark.sql.functions.lit(1)).sum("id", "v")
    val r = q.collect()(0)
    assert(r.getLong(1) == (1L to 10000L).sum && r.getDouble(2) == (1 to 10000).map(_ * 0.5).sum)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"expected columnar scan handoff:\n$plan")
  }

  test("failed write aborts atomically: no partial file visible, dir reusable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_arrowds_f").toString
    // one task throws mid-write (ANSI divide-by-zero on id 50, after
    // earlier rows were already handed to the writer)
    val bad = (1 to 100).map(_.toLong).toDF("id").repartition(2)
      .select(col("id"), (col("id") / (col("id") - lit(50L))).as("v"))
    intercept[Exception] {
      bad.write.format(fmt).mode("overwrite").save(dir)
    }
    val top = new java.io.File(dir).listFiles().toSeq
    assert(!top.exists(_.getName.endsWith(".arrow")),
      s"failed job must leave no visible .arrow files, found: $top")
    assert(!top.exists(_.getName == "_temporary"),
      "job abort must remove the _temporary dir")
    // the directory is immediately reusable for a clean write
    val good = (1 to 10).map(i => (i.toLong, i * 2.0)).toDF("id", "v").repartition(2)
    good.write.format(fmt).mode("overwrite").save(dir)
    assert(!new java.io.File(dir, "_temporary").exists,
      "successful commit must remove the _temporary dir")
    val back = spark.read.format(fmt).load(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      (1 to 10).map(i => (i.toLong, i * 2.0)).toSet)
  }
}
