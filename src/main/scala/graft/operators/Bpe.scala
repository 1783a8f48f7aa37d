package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — distributed tokenizer training.
  *
  * Classic BPE (Sennrich et al. 2016) over the corpus word-frequency
  * table: start from character symbols, repeatedly (1) count adjacent
  * symbol pairs corpus-wide, (2) take the most frequent pair, (3) merge
  * every occurrence. The learned merge list IS the tokenizer.
  *
  * Scale shape: the corpus touches the cluster exactly once (one
  * word-count shuffle). Every round after that runs on the *vocabulary*
  * table (|V| rows, ~10⁵-10⁶ at web scale — independent of corpus
  * size): pair counting is an in-row generator + one |V|-sized shuffle
  * agg, argmax is a single-row `orderBy.limit(1)`, and applying the
  * merge is a broadcast of that one row + a scan-parallel string
  * rewrite. No round ever re-reads the corpus.
  *
  * Merge application uses space-anchored non-overlapping replace on a
  * TWO-space-separated symbol string: pattern `" a  b "` → `" ab "`.
  * Double separators make this exactly greedy left-to-right pair
  * merging — each match consumes only the inner space of each
  * separator, so the occurrence scan (which resumes after a match)
  * still sees the leading space of an immediately adjacent pair
  * (`a b a b` → `ab ab`, `aaaa` → `aa aa`; a single-space encoding
  * would skip every second site). Engine-portable: `replace` has
  * identical continue-after-match semantics in Spark and the DuckDB
  * oracle, and the anchoring spaces prevent matches inside multi-char
  * symbols.
  */
object Bpe {

  /** Learn `rounds` merges from a (word, freq) vocabulary.
    *
    * @param vocab columns (`word` string, `freq` long)
    * @return one row per merge: (round, lhs, rhs, merged, weight)
    */
  def learnMerges(spark: SparkSession, vocab: DataFrame, rounds: Int): DataFrame =
    run(spark, vocab, rounds)._1

  /** The encode side: the vocabulary after `rounds` learned merges —
    * (word, freq, tokens array). Applying a FIXED merge list to new
    * text is the same per-row replace chain (map-only, broadcastable
    * merges); here the list is learned and applied in one pass.
    */
  def encodeVocab(spark: SparkSession, vocab: DataFrame, rounds: Int): DataFrame =
    run(spark, vocab, rounds)._2
      .select(col("word"), col("freq"), split(trim(col("repr")), "  ").as("tokens"))

  private def run(spark: SparkSession, vocab: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // "  k  e  y  " — two-space separators (see class doc)
    // Each round's repr is persisted so round r+1 (and the argmax rows)
    // derive from the cached |V|-row table instead of re-deriving the
    // whole chain from the corpus — without this, round r costs r
    // corpus scans and the loop goes quadratic. Caches are released
    // through the spillRelease ending below (block manager left clean).
    var repr = vocab.select(col("word"), col("freq"),
      concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  ")).as("repr"))
      .persist()
    val cached = Seq.newBuilder[DataFrame]
    cached += repr
    val merges = Seq.newBuilder[DataFrame]
    for (r <- 1 to rounds) {
      val toks = repr.select(col("freq"), split(trim(col("repr")), "  ").as("t"))
        .filter(size(col("t")) >= 2) // sequence(2,1) would run backwards
      val pairs = toks.select(col("freq"),
          explode(expr("transform(sequence(2, size(t)), i -> struct(t[i-2] as lhs, t[i-1] as rhs))")).as("p"))
        .select(col("p.lhs"), col("p.rhs"), col("freq"))
      val best = pairs.groupBy("lhs", "rhs").agg(sum("freq").as("weight"))
        .orderBy(col("weight").desc, col("lhs"), col("rhs")).limit(1)
      merges += best.select(lit(r).as("round"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("weight"))
      repr = repr.crossJoin(broadcast(best))
        .withColumn("repr", org.apache.spark.sql.functions.replace(col("repr"),
          concat(lit(" "), col("lhs"), lit("  "), col("rhs"), lit(" ")),
          concat(lit(" "), col("lhs"), col("rhs"), lit(" "))))
        .select("word", "freq", "repr")
        .persist()
      cached += repr
    }
    val all = cached.result()
    // spill the final repr FIRST (fills the round caches in one pass),
    // then the merge rows (served from those caches); the second spill
    // releases every cached round — block manager left clean
    val reprOut = Materialize.spillRelease(repr)
    val mergesOut = Materialize.spillRelease(merges.result().reduce(_ unionAll _), all: _*)
    (mergesOut, reprOut)
  }
}
