package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup

class TextFunctionsSpec extends SparkSpec {

  test("wordShingles builds distinct n-grams") {
    import spark.implicits._
    val out = Seq("a b c d a b c d").toDF("t")
      .select(wordShingles(words(col("t")), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(out.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("mdHash is deterministic and in [0, 2^60)") {
    import spark.implicits._
    val out = Seq("x", "x", "y").toDF("s").select(mdHash(col("s")).as("h")).collect()
    assert(out(0).getLong(0) == out(1).getLong(0))
    assert(out(0).getLong(0) != out(2).getLong(0))
    assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) < (1L << 60)))
  }

  test("jaccard: identical=1, disjoint=0") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d")))
      .toDF("x", "y", "z")
    val r = df.select(jaccard(col("x"), col("y")), jaccard(col("x"), col("z"))).collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("langId classifies stopword-bearing and CJK snippets") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on the mat and looked to the door",
      "el perro corre en la casa de los vecinos",
      "le chien et les chats des voisins",
      "der hund und die katze mit dem ball",
      "你好世界 hello",
      "xyzzy plugh").toDF("t")
    val out = df.select(langId(col("t"), words(col("t"))).as("l")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "es", "fr", "de", "zh", "und"))
  }

  test("minhash LSH finds a known near-dup pair, skips unrelated docs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("id", "text")
    val pairs = Dedup.minhashLshPairs(df, "id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("simhash: identical word sets collide, disjoint sets (almost surely) differ") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha alpha"),  // same word set, reordered+repeat
      (3L, "completely different words entirely here"))
      .toDF("id", "text")
    val out = df.select(col("id"), words(col("text")).as("w"))
      .withColumn("sh", simhash64("w")).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("quality score stays in [0,1] and rewards diversity") {
    import spark.implicits._
    val df = Seq("a a a a a a a a", "the quick brown fox jumps over lazy dogs").toDF("t")
    val out = df.select(qualityScore(col("t"), words(col("t"))).as("q"))
      .collect().map(_.getDouble(0))
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1) > out(0))
  }

  test("exact dedup groups copies and keeps min id") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "unique")).toDF("id", "text")
    val g = Dedup.exactGroups(df, "id", "text")
      .filter(col("n_copies") >= 2).collect()
    assert(g.length == 1 && g(0).getAs[Long]("kept_id") == 1L && g(0).getAs[Long]("n_copies") == 2L)
  }

  test("MinHash kernel is bit-identical to the declarative formulation") {
    import spark.implicits._
    // Dedup.minhashSignatures (md5-byte-mask JVM kernel) is THE
    // canonical path; TextFunctions.minhashSignature (hex-substring
    // Catalyst expressions) must produce the same 48 longs per doc or
    // the two implementations have drifted.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the long trip home"),
      (3L, "sphinx of black quartz judge my vow said the 不只是 weary traveler"),
      // edge shapes the JVM shingler must match exactly: empty text,
      // consecutive/trailing spaces (empty tokens), fewer words than n
      (4L, ""), (5L, "a  b "), (6L, "one two"), (7L, "repeat repeat repeat repeat"))
      .toDF("doc_id", "text")
    val kernel = Dedup.minhashSignatures(docs, "doc_id", "text", 48)
      .select(col("id"), col("sig")).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    val declarative = docs.select(
        col("doc_id").as("id"),
        minhashSignature(shingleHashPairs(wordShingles(words(col("text")), 3)), 48).as("sig"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    assert(kernel.toSeq == declarative.toSeq)
  }

  test("SimHash kernel is bit-identical to the declarative formulation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the long trip home"),
      (3L, "sphinx of black quartz judge my vow said the 不只是 weary traveler"))
      .toDF("doc_id", "text")
    val kernel = Dedup.simhashSketches(docs, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val declarative = docs.select(col("doc_id").as("id"),
        words(col("text")).as("w"))
      .withColumn("sh64", simhash64("w"))
      .select("id", "sh64")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kernel.toSeq == declarative.toSeq)
  }

  test("fingerprint kernel is bit-identical to the declarative formulation") {
    import spark.implicits._
    // Dedup.fingerprints (md5-byte-mask JVM kernel, q63's path) must
    // equal bowFingerprint + minShingleFingerprint (hex-substring
    // Catalyst expressions, the oracle's definition) — same UTF-8-byte
    // word sort as sort_array, same concat_ws empty-string handling,
    // same shingling, same 60-bit parse.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the long trip home"),
      (3L, "sphinx of black quartz judge my vow said the 不只是 weary traveler"),
      // edge shapes: empty text, consecutive/trailing spaces (empty
      // tokens — sort_array puts "" first and concat_ws still separates),
      // fewer words than n, pure repetition
      (4L, ""), (5L, "a  b "), (6L, "one two"), (7L, "repeat repeat repeat repeat"))
      .toDF("doc_id", "text")
    val kernel = Dedup.fingerprints(docs, "doc_id", "text", 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val declarative = docs.select(
        col("doc_id").as("id"),
        bowFingerprint(words(col("text"))).as("fp"),
        minShingleFingerprint(wordShingles(words(col("text")), 3)).as("minfp"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(kernel.toSeq == declarative.toSeq)
  }

  test("gopherVerdict fires each rule with first-match precedence") {
    import spark.implicits._
    val mid = (1 to 20).map(_ => "abcd").mkString(" ") // nw=20, mwl=4.0
    val docs = Seq(
      (1L, "tiny doc"),                                   // too_short
      (2L, (1 to 99).map(_ => "okay").mkString(" ")),     // too_long (nw=99)
      (3L, mid),                                          // word_len (mwl 4.0 < 4.3)
      (4L, (1 to 20).map(_ => "ab3d!").mkString(" ")),    // word_len fires before symbols
      (5L, (1 to 20).map(i => if (i % 2 == 0) "abcd" else "abcde").mkString(" ")))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        graft.functions.TextFunctions.gopherVerdict(col("text"),
          graft.functions.TextFunctions.words(col("text"))).as("r"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(got == Seq("too_short", "too_long", "word_len", "word_len", "pass"), got)
    // symbols branch: in-band length/word-len but non-alpha chars
    val sym = (1 to 20).map(i => if (i % 2 == 0) "ab3d" else "abcde").mkString(" ")
    val r = Seq((1L, sym)).toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.gopherVerdict(col("text"),
        graft.functions.TextFunctions.words(col("text")))).collect()(0).getString(0)
    assert(r == "symbols", r)
  }

  test("span-scrub window hashes are bit-identical to the mdHash column") {
    import spark.implicits._
    // q172's kernel parses the 60-bit hash from md5 digest bytes; it
    // must equal mdHash (= conv(substr(md5(x),1,15),16,10)) for any
    // window string or the kernel and the DuckDB oracle have drifted.
    val samples = Seq("a b c d e f g h", "", "x", "不只是 weary traveler here now",
      "one  two   three four five six seven eight")
    val md = java.security.MessageDigest.getInstance("MD5")
    val kernel = samples.map { t =>
      md.reset()
      val dg = md.digest(t.getBytes("UTF-8"))
      var a = 0L
      var k = 0
      while (k < 7) { a = (a << 8) | (dg(k) & 0xffL); k += 1 }
      (a << 4) | ((dg(7) & 0xf0L) >>> 4)
    }
    val declarative = samples.toDF("s")
      .select(mdHash(col("s")).as("h")).collect().map(_.getLong(0)).toSeq
    assert(kernel == declarative)
  }
}
