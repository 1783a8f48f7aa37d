package graft

import org.apache.spark.sql.functions._

/** Reference demo scenarios for strings/lists (FIXTURES.md A2/A3):
  * UTF-8 incl. CJK, list columns with null elements, and the
  * flat-child `transform` combinator (functional/velox.py:6-18).
  */
class ColumnsSpec extends SparkSpec {

  test("UTF-8 strings: char length vs byte length, substring, CJK") {
    import spark.implicits._
    // demo/string_col.py:31,41-43
    val df = Seq("abc", "de", "XYZ", "abcXYZ", "123", "不只是ascii").toDF("s")
    val out = df.select(
      col("s"),
      length(col("s")).as("chars"),
      octet_length(col("s")).as("bytes"),
      substring(col("s"), 1, 3).as("pre")).collect()
    assert(out(5).getInt(1) == 8)        // 3 CJK chars + 5 ascii
    assert(out(5).getInt(2) == 14)       // 3 * 3 bytes + 5
    assert(out(5).getString(3) == "不只是")
    assert(out(0).getInt(1) == 3 && out(0).getInt(2) == 3)
  }

  test("list column with null elements: A2 fixture shape is preserved") {
    import spark.implicits._
    // offsets [0,1,3,6,8] over child [1,N,3,4,N,6,7,8] (criteo.py:46-47)
    val rows = Seq(
      Seq[Option[Long]](Some(1L)),
      Seq[Option[Long]](None, Some(3L)),
      Seq[Option[Long]](Some(4L), None, Some(6L)),
      Seq[Option[Long]](Some(7L), Some(8L)))
    val df = rows.toDF("xs")
    val out = df.select(size(col("xs")).as("n"),
      aggregate(filter(col("xs"), _.isNotNull), lit(0L), _ + _).as("s")).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 2))
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 10L, 15L))
  }

  test("transform = velox flat-child map: applies f per element, keeps nulls & shape") {
    import spark.implicits._
    // velox.py:11-18: f over flattened child, rewrap with same offsets/presence.
    // Spark's ArrayTransform has identical semantics (null elements -> null out).
    val df = Seq(Seq[Option[Long]](Some(1L), None, Some(3L))).toDF("xs")
    val out = df.select(transform(col("xs"), x => x * 10).as("ys"))
      .collect()(0).getSeq[Any](0)
    assert(out == Seq(10L, null, 30L))
  }

  test("list of strings via explode round-trip") {
    import spark.implicits._
    // demo/string_col.py:21-24: [["abc","de"],["XYZ"],["abcXYZ","123"]]
    val df = Seq(Seq("abc", "de"), Seq("XYZ"), Seq("abcXYZ", "123")).toDF("xs")
    val flat = df.select(explode(col("xs")).as("x")).collect().map(_.getString(0))
    assert(flat.toSeq == Seq("abc", "de", "XYZ", "abcXYZ", "123"))
  }

  test("Arrow IPC round-trip: CJK strings, null masks, mixed types survive") {
    import spark.implicits._
    import graft.ops._
    // reference to_arrow/from_arrow (string_column.py:76-102,
    // numeric_column.py:138-159): in-memory Arrow interop with
    // validity masks intact
    val df = Seq[(java.lang.Long, String, java.lang.Double, java.lang.Boolean)](
        (1L, "abc", 1.5, true),
        (null, "不只是ascii", null, false),
        (3L, null, -0.25, null))
      .toDF("i", "s", "d", "b")
    val bytes = df.toArrowBytes
    assert(bytes.nonEmpty)
    val back = graft.sources.ArrowInterop.fromArrowBytes(bytes, spark)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("i").collect().map(_.toSeq).toSeq
    val b = back.orderBy("i").collect().map(_.toSeq).toSeq
    assert(a == b)
    // the CJK string survives byte-exact
    assert(back.filter(col("i").isNull).collect()(0).getString(1) == "不只是ascii")
  }

  test("slice semantics: contiguous row range (reference zero-copy slice)") {
    import spark.implicits._
    val df = spark.range(100).toDF("i")
    // offset+limit = reference __getitem__(slice) (string_column.py:37-54)
    val out = df.orderBy("i").offset(10).limit(5).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(10L, 11L, 12L, 13L, 14L))
  }
}
