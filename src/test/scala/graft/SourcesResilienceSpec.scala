package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sources.Tables

/** Resilience of the table layer against the failure modes that burned
  * round 5: a harness data regen changing a column's physical type
  * mid-JVM, a stale schema cache serving the old vintage, and one bad
  * table poisoning view registration for all the others.
  */
class SourcesResilienceSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft_resilience").toString

  private def copyFixtures(dst: String, tables: Seq[String]): Unit =
    tables.foreach { t =>
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$dst/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }

  test("events reader adapts to both ts vintages (timestamp[us] and nanos-long)") {
    // current harness vintage: timestamp[us] → TimestampType, values intact
    val now = Tables.events(spark, "/root/testdata/sf0.001")
    assert(now.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val n = now.count()
    assert(n > 0)
    // synthesize the historical nanos-long vintage: same rows, ts as
    // epoch-nanos LongType (what TIMESTAMP(NANOS) loads as under the
    // legacy conf) — reader must floor to micros and agree exactly
    val dir = freshDir()
    now.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val legacy = Tables.events(spark, dir)
    assert(legacy.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val mismatch = now.select("event_id", "ts")
      .except(legacy.select("event_id", "ts")).count()
    assert(mismatch == 0 && legacy.count() == n)
  }

  test("schema cache recovers when a table is rewritten with a new schema mid-session") {
    val dir = freshDir()
    copyFixtures(dir, Seq("region"))
    val first = Tables.table(spark, dir, "region")
    assert(first.schema.fieldNames.contains("r_regionkey"))
    first.count() // force a full read so the schema is cached warm
    // harness-regen simulation: same path, different schema AND mtime/size
    spark.range(5).select(col("id").as("r_regionkey"),
        concat(lit("R"), col("id")).as("r_name"), lit(1.5).as("r_extra"))
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val second = Tables.table(spark, dir, "region")
    assert(second.schema.fieldNames.contains("r_extra"),
      s"stale cached schema served after rewrite: ${second.schema.treeString}")
    assert(second.count() == 5)
  }

  test("registerAll isolates a poisoned table: other views stay queryable") {
    val dir = freshDir()
    copyFixtures(dir, Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings"))
    // a deliberately corrupt events file (not parquet at all)
    Files.writeString(Paths.get(s"$dir/events.parquet"), "this is not parquet")
    val s2 = spark.newSession()
    Tables.registerAll(s2, dir) // must not throw
    assert(s2.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(s2.sql(
      "SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey")
      .head().getLong(0) > 0)
  }

  test("data-contract canary reports OK for harness fixtures and FAIL for a broken table") {
    val okLines = graft.sources.DataContract.report(spark, "/root/testdata/sf0.001")
    assert(okLines.size == Tables.names.size)
    assert(okLines.forall(_.startsWith("OK")), okLines.mkString("\n"))
    val dir = freshDir()
    copyFixtures(dir, Tables.names.filterNot(_ == "events"))
    Files.writeString(Paths.get(s"$dir/events.parquet"), "corrupt")
    val lines = graft.sources.DataContract.report(spark, dir)
    assert(lines.count(_.startsWith("FAIL")) == 1)
    assert(lines.find(_.startsWith("FAIL")).get.contains("events"))
  }

  test("data-contract canary catches value-level corruption: null text, ragged embeddings") {
    import spark.implicits._
    // right SCHEMA, wrong VALUES — the class of regen breakage the type
    // check alone would wave through
    val dir = freshDir()
    copyFixtures(dir, Tables.names.filterNot(n => n == "documents" || n == "embeddings"))
    Seq((1L, "ok text", "en", "web", 7L), (2L, null.asInstanceOf[String], "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val lines = graft.sources.DataContract.report(spark, dir)
    val docLine = lines.find(_.contains("documents")).get
    assert(docLine.startsWith("FAIL") && docLine.contains("null/empty"), docLine)
    val embLine = lines.find(_.contains("embeddings")).get
    assert(embLine.startsWith("FAIL") && embLine.contains("ragged"), embLine)
  }
}
