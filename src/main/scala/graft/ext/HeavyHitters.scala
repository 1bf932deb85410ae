package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters summary (Misra & Gries 1982; merge
  * rule from Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Why a sketch when `t5_text_top_tokens` already does the exact word count:
  * the exact form shuffles the FULL token→count domain — at 100 TB of text
  * that is billions of distinct keys through the exchange. This summary is a
  * bounded `capacity`-entry map per partition (map-side partial aggregation
  * does the heavy lifting), so the shuffle moves ≤ capacity entries per task
  * no matter the corpus, at the cost of undercounting each survivor by at
  * most N/(capacity+1).
  *
  * Guarantee used by the `g5` oracle gate: every token with true frequency
  * > N/(capacity+1) is present in the summary, with
  * `true − N/(capacity+1) ≤ estimate ≤ true`.
  *
  * Buffers live as plain JVM maps inside a partition (Spark's typed
  * `Aggregator` only encodes them at shuffle boundaries); the per-row
  * decrement-all is amortized O(1) — each decrement retires one prior
  * insertion.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(capacity > 0, "capacity must be positive")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], token: String): Map[String, Long] =
    b.get(token) match {
      case Some(c) => b.updated(token, c + 1L)
      case None if b.size < capacity => b.updated(token, 1L)
      case None =>
        // decrement-all: retires one count from every tracked token
        b.iterator.map { case (t, c) => (t, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count from everything — the
      // merged summary keeps the mergeable-summaries error bound
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      combined.iterator.map { case (t, c) => (t, c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  def finish(r: Map[String, Long]): Map[String, Long] = r

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
