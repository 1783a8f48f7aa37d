package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene pass (run with 13-grams on real corpora; n is a parameter).
  *
  * Scale design: both sides explode to distinct (doc, n-gram-hash)
  * pairs and meet in a hash equi-join on the 8-byte hash — shuffle
  * volume is the number of n-gram occurrences, never |train|×|eval|,
  * and the per-pair overlap count comes from a partial-aggregable
  * count. The eval side is tiny in practice (benchmarks), so Spark
  * broadcasts it and the train side never shuffles at all.
  */
object Contamination {

  /** (train_id, eval_id, n_shared) for every train/eval pair sharing at
    * least `minShared` distinct word n-grams. The join key is the raw
    * n-gram string: the broadcast hashmap hashes it once on build/probe
    * anyway, so pre-hashing (md5/xxhash64) would only buy smaller rows
    * — worth it when the eval side outgrows broadcast and the join must
    * shuffle, not here.
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int, minShared: Long): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // distinct grams built in a JVM kernel (Dedup.shingleStrings, the
    // shared bit-identical shingler) — the declarative explode-of-
    // wordShingles chain runs interpreted per row
    def grams(df: DataFrame, out: String) = {
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
        .as[(Long, String)]
        .flatMap { case (id, text) => Dedup.shingleStrings(text, n).map(s => (id, s)) }
        .toDF(out, "s")
    }
    grams(train, "train_id")
      .join(broadcast(grams(eval, "eval_id")), Seq("s"))
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
