package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One surviving Misra–Gries counter: an item and its lower-bound
  * estimate. Top-level so the Encoder derivation can codegen it. */
case class MGEntry(item: String, est: Long)

/** Misra–Gries heavy-hitters summary as a mergeable typed Aggregator —
  * the bounded-memory frequent-items sketch (Misra & Gries 1982;
  * mergeability per Agarwal et al. 2013, "Mergeable Summaries").
  *
  * State is at most k−1 counters regardless of stream length. The
  * guarantee: after a stream of n items, every item with true count
  * > n/k survives in the summary, and each surviving estimate
  * undercounts by at most n/k. That makes it the 100 TB answer to
  * "which tokens/domains/keys dominate this corpus": the map-side
  * partial holds ≤ k−1 entries per mapper, the exchange carries
  * ≤ (k−1)·mappers rows total, and no exact per-item groupBy of the
  * full stream ever happens.
  *
  * Merge sums counters pairwise, then — if over capacity — subtracts
  * the k-th largest count from every counter and drops the non-positive
  * remainder; the combined error stays ≤ n/k (the mergeable-summaries
  * bound), so the containment gate below survives arbitrary partial
  * aggregation trees.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Array[MGEntry]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k - 1 => buf.updated(item, 1L)
      case None =>
        // decrement-all: one stream item cancels one unit of every counter
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (i, c)) => m.updated(i, m.getOrElse(i, 0L) + c) }
    if (sum.size <= k - 1) sum
    else {
      val pivot = sum.values.toArray.sortBy(-_).apply(k - 1)
      sum.view.mapValues(_ - pivot).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Array[MGEntry] =
    buf.toArray.sortBy { case (i, c) => (-c, i) }.map { case (i, c) => MGEntry(i, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[MGEntry]] = ExpressionEncoder()
}
