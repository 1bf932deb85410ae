package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary induction (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL 2016).
  *
  * The at-scale shape real BPE trainers use: merges are learned from the
  * WORD-COUNT table, never the raw corpus — one corpus-sized shuffle up
  * front collapses 100 TB of text to |vocab| rows (millions, not billions),
  * and each of the R merge rounds is then one narrow aggregation over that
  * table: explode adjacent symbol pairs weighted by word count, argmax, and
  * a map-side rewrite of the symbol sequences. Only the single winning pair
  * ever reaches the driver per round.
  *
  * Determinism: ties on pair count break lexicographically, so the learned
  * merge table is identical across runs, partitionings and engines — which
  * is what lets the t11 oracle restate merge #1 independently in DuckDB.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long) {
    def token: String = left + right
  }

  /** Learn `rounds` merges from the corpus' word counts. */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // one corpus pass: word-count table (the only corpus-sized shuffle)
    val wordCounts = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
    // symbol sequences start as single CODE POINTS (not UTF-16 units — a
    // char-level split would shear astral-plane text into lone surrogates,
    // which UTF8String replaces on shuffle; DuckDB's substr pairs code
    // points, so this is also what keeps the t11 oracle comparable)
    var syms: Dataset[(Seq[String], Long)] = wordCounts
      .map { case (w, c) => (codePointSyms(w), c) }
      .persist()
    val merges = Vector.newBuilder[Merge]
    var rank = 1
    while (rank <= rounds) {
      val top = syms.flatMap { case (s, c) =>
        if (s.length < 2) Iterator.empty
        else s.iterator.zip(s.iterator.drop(1)).map(p => (p._1, p._2, c))
      }
        .toDF("l", "r", "c")
        .groupBy(col("l"), col("r")).agg(sum(col("c")).as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) { rank = rounds + 1 } // no pairs left — vocab exhausted
      else {
        val (l, r, n) = top.head
        merges += Merge(rank, l, r, n)
        val prev = syms
        syms = syms.map { case (s, c) => (applyMerge(s, l, r), c) }.persist()
        syms.count() // materialize before unpersisting the parent lineage
        prev.unpersist()
        rank += 1
      }
    }
    syms.unpersist()
    merges.result()
  }

  /** Unicode code points of a word as one-symbol strings. */
  def codePointSyms(w: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One merge pass over a symbol sequence (left-to-right, non-overlapping —
    * the standard BPE application order).
    */
  def applyMerge(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Segment a word with a learned merge table (greedy in merge order). */
  def encode(word: String, merges: Seq[Merge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(codePointSyms(word)) {
      (s, m) => applyMerge(s, m.left, m.right)
    }
}
