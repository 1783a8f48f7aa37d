package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multi-keyword scanning with an Aho-Corasick automaton — the
  * blocklist primitive of a curation pipeline (toxic terms, takedown
  * strings, licence markers). A pipeline that runs k `regexp_replace`
  * or `contains` passes scans every document k times; the automaton
  * finds ALL occurrences of ALL k patterns in ONE pass per document
  * (O(|text| + matches) regardless of k), which is the difference
  * between feasible and not when the blocklist has thousands of
  * entries at 100 TB.
  *
  * The automaton builds once per partition from the closure-carried
  * term list (bounded model state riding the closure like a broadcast,
  * the BPE-merge-list pattern), then streams rows.
  *
  * Counting contract: per term, occurrences are counted LEFTMOST
  * NON-OVERLAPPING (after a match of term t at [s, s+|t|), the next
  * match of t must start at ≥ s+|t|) — exactly the semantics of a
  * sequential `indexOf`/step loop and of the SQL counting identity
  * `(len(x) - len(replace(x, t, ''))) / len(t)`, which is what lets a
  * SQL oracle verify the automaton bit-for-bit. Distinct terms count
  * independently (overlaps BETWEEN different terms both count).
  */
object KeywordScrub {

  /** Goto/fail/output automaton over UTF-16 chars. Match emission
    * order is by end position (then by pattern), which for a single
    * pattern is increasing start order — what the greedy
    * non-overlapping counter needs.
    */
  private[graft] final class AhoCorasick(terms: Array[String]) {
    require(terms.nonEmpty, "empty term list")
    require(terms.forall(_.nonEmpty), "empty pattern in term list")
    // trie as growable parallel arrays; transitions in per-node hash maps
    // (blocklist alphabets are unbounded — unicode text)
    private val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val fail = scala.collection.mutable.ArrayBuffer(0)
    // patterns ending at this node (via output links, flattened below)
    private val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

    terms.zipWithIndex.foreach { case (t, ti) =>
      var node = 0
      t.foreach { ch =>
        node = if (children(node).containsKey(ch)) children(node).get(ch)
        else {
          children += new java.util.HashMap[Char, Int]()
          fail += 0
          out += Nil
          val id = children.size - 1
          children(node).put(ch, id)
          id
        }
      }
      out(node) = ti :: out(node)
    }

    // BFS failure links; output sets merge along the failure chain so a
    // node's `out` lists every pattern ending at its depth
    locally {
      val q = scala.collection.mutable.Queue[Int]()
      children(0).forEach { (_, c) => fail(c) = 0; q.enqueue(c) }
      while (q.nonEmpty) {
        val u = q.dequeue()
        children(u).forEach { (ch, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
          fail(v) = if (children(f).containsKey(ch) && children(f).get(ch) != v)
            children(f).get(ch) else 0
          out(v) = out(v) ::: out(fail(v))
          q.enqueue(v)
        }
      }
    }

    private val termLen = terms.map(_.length)

    /** Per-term leftmost-non-overlapping occurrence counts. */
    def countNonOverlapping(text: String): Array[Long] = {
      val counts = new Array[Long](terms.length)
      val nextOk = new Array[Int](terms.length) // min allowed start per term
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !children(node).containsKey(ch)) node = fail(node)
        if (children(node).containsKey(ch)) node = children(node).get(ch)
        var os = out(node)
        while (os.nonEmpty) {
          val ti = os.head
          val start = i - termLen(ti) + 1
          if (start >= nextOk(ti)) {
            counts(ti) += 1
            nextOk(ti) = start + termLen(ti)
          }
          os = os.tail
        }
        i += 1
      }
      counts
    }
  }

  /** One automaton pass per document: emits a (doc_id, term, n) row for
    * every term with ≥ 1 occurrence. `terms` is the bounded blocklist
    * (driver-held model state); documents never leave the executors.
    */
  def countTerms(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val termArr = terms.toArray
    Kernels.fanOut(docs.select(
        col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t")))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ac = new AhoCorasick(termArr) // build once per partition
        rows.flatMap { case (id, t) =>
          val c = ac.countNonOverlapping(if (t == null) "" else t)
          termArr.indices.iterator
            .filter(i => c(i) > 0)
            .map(i => (id, termArr(i), c(i)))
        }
      }
      .toDF("doc_id", "term", "n")
  }
}
