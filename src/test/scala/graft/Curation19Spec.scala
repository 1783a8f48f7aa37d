package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Graph, Sessionize}

/** Round-7 second-wave operator semantics: BFS hop distances, in-row
  * combination generation, gap sessionization — each checked against a
  * brute-force model and across partitionings (the local stand-in for
  * multi-executor layouts).
  */
class Curation19Spec extends SparkSpec {

  test("bfsHops: exact min-hop distances, invariant under partitioning") {
    import spark.implicits._
    // chain 1-2-3-4-5, branch 2-6, disconnected 7-8; directed both ways
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L), (7L, 8L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val seeds = Seq(1L, 7L).toDF("sd")
    val expected = Set(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 6L, 2L),
      (7L, 7L, 0L), (7L, 8L, 1L))
    for (parts <- Seq(1, 7)) {
      val got = Graph.bfsHops(edges.repartition(parts), seeds, maxHop = 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("triples: in-row generation equals brute-force combinations") {
    import spark.implicits._
    val baskets = Seq(
      Seq(1L, 2L, 3L),
      Seq(10L, 20L, 30L, 40L),
      Seq(5L, 6L, 7L, 8L, 9L))
    val got = baskets.toDF("ps")
      .select(explode(GraftFunctions.triples(col("ps"))).as("t"))
      .select("t.p1", "t.p2", "t.p3")
      .as[(Long, Long, Long)].collect().toSet
    val expected = baskets.flatMap(_.combinations(3).map {
      case Seq(a, b, c) => (a, b, c)
    }).toSet
    assert(got == expected && got.size == 1 + 4 + 10)
  }

  test("winnowFingerprints: kernel is bit-identical to the declarative slice chain") {
    import spark.implicits._
    import graft.functions.TextFunctions.mdHash
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "x y"), // too short: no full window, no rows
      (4L, "a a a a a a"), // repeated tokens collapse to one fingerprint
      (5L, "多 字 节 字 符 的 文 本 行")).toDF("doc_id", "text")
    val kernel = graft.operators.Dedup
      .winnowFingerprints(docs, "doc_id", "text", n = 3, w = 4)
      .as[(Long, Long)].collect().toSet
    val declarative = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 6)
      .withColumn("hs", transform(sequence(lit(1), size(col("w")) - 2), i =>
        mdHash(concat_ws(" ", slice(col("w"), i, lit(3))))))
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("hs")) - 3), i =>
          array_min(slice(col("hs"), i, lit(4)))))).as("fp"))
      .as[(Long, Long)].collect().toSet
    assert(kernel == declarative && kernel.nonEmpty)
    assert(!kernel.exists(_._1 == 3L) && kernel.count(_._1 == 4L) == 1)
  }

  test("sessionize: gap rule matches hand model, invariant under partitioning") {
    import spark.implicits._
    val gap = 100L
    // user 1: sessions {0,50,120}, {300}; user 2: {0}, {500,550}
    val rows = Seq((1L, 0L), (1L, 50L), (1L, 120L), (1L, 300L),
      (2L, 0L), (2L, 500L), (2L, 550L))
    val expected = Set(
      (1L, 0L, 1L), (1L, 50L, 1L), (1L, 120L, 1L), (1L, 300L, 2L),
      (2L, 0L, 1L), (2L, 500L, 2L), (2L, 550L, 2L))
    for (parts <- Seq(1, 5)) {
      val df = rows.toDF("uid", "tus").repartition(parts)
      val got = Sessionize.assign(df, col("uid"), col("tus"), Seq(col("tus")), gap)
        .select("uid", "tus", "sid").as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }
}
