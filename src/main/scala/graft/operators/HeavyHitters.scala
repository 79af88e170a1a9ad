package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed Spark Aggregator —
  * the bounded-memory sketch shape for "top items in 100 TB of text"
  * where an exact global word count would be fine but a per-partition
  * k-entry summary is 1000× cheaper to shuffle: each task reduces its
  * split into ≤ k counters, and only summaries cross the wire.
  *
  * Guarantees (classic MG bounds): estimates are UNDERCOUNTS with
  * error ≤ n/(k+1) per merge level; any item with true frequency
  * > n/(k+1) is guaranteed present in the final summary. When
  * k ≥ distinct-item count the summary never evicts, so counts are
  * EXACT — the n_heavy_hitters query runs in that regime, which is
  * what makes it oracle-checkable against a plain GROUP BY (the
  * approximation regime is spec'd separately with bound assertions,
  * OperatorSpec-style, at small k).
  */
final case class HHSummary(counts: Map[String, Long])

class HeavyHitters(k: Int, topN: Int)(
    implicit bufEnc: Encoder[HHSummary],
    outEnc: Encoder[Seq[(String, Long)]])
  extends Aggregator[String, HHSummary, Seq[(String, Long)]] {

  def zero: HHSummary = HHSummary(Map.empty)

  def reduce(b: HHSummary, x: String): HHSummary = {
    val m = b.counts
    m.get(x) match {
      case Some(c) => HHSummary(m.updated(x, c + 1L))
      case None if m.size < k => HHSummary(m.updated(x, 1L))
      case None =>
        // MG eviction: decrement every counter, drop zeros — the new
        // item is absorbed into the shared decrement
        HHSummary(m.flatMap { case (w, c) =>
          if (c > 1L) Some(w -> (c - 1L)) else None
        })
    }
  }

  def merge(a: HHSummary, b: HHSummary): HHSummary = {
    val sum = (a.counts.keySet ++ b.counts.keySet).iterator
      .map(w => w -> (a.counts.getOrElse(w, 0L) + b.counts.getOrElse(w, 0L)))
      .toMap
    if (sum.size <= k) HHSummary(sum)
    else {
      // compress back to k entries: subtract the (k+1)-largest count
      // (Agarwal et al.'s mergeable-summaries MG merge)
      val thresh = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      HHSummary(sum.flatMap { case (w, c) =>
        if (c > thresh) Some(w -> (c - thresh)) else None
      })
    }
  }

  def finish(b: HHSummary): Seq[(String, Long)] =
    b.counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(topN)

  def bufferEncoder: Encoder[HHSummary] = bufEnc
  def outputEncoder: Encoder[Seq[(String, Long)]] = outEnc
}
