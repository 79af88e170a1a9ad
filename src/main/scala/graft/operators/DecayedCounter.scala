package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable exponential half-life counter — the streaming face of
  * n_time_decay_agg's rescaling law: state is ONE (decayed sum, as-of
  * timestamp) pair; folding an event rescales the sum to the newer
  * as-of (`C · 2^(-(T'-T)/h)`) and adds the event's decayed weight, and
  * merging two counters rescales the older to the newer and adds.
  * History is never reprocessed — the property that makes half-life
  * metrics maintainable on an unbounded feed with O(1) state per key.
  *
  * Associativity note: rescaling is exact in the reals
  * (2^a · 2^b = 2^(a+b)) but floating-point `pow` composes to within
  * ULPs, so stream and batch agree to ~1e-9 relative rather than
  * bit-for-bit — StreamingSpec pins the tolerance explicitly.
  *
  * Input: (eventTimeMicros, weight). halfLifeUs defaults to 7 days.
  */
final case class DecayedCounter(halfLifeUs: Double = 604800000000.0)
    extends Aggregator[(Long, Double), (Double, Long), (Double, Long)] {

  private def rescale(sum: Double, from: Long, to: Long): Double =
    if (to == from) sum else sum * math.pow(2.0, -(to - from).toDouble / halfLifeUs)

  override def zero: (Double, Long) = (0.0, Long.MinValue)

  override def reduce(b: (Double, Long), a: (Long, Double)): (Double, Long) = {
    val (sum, asOf) = b
    val (t, w) = a
    if (asOf == Long.MinValue) (w, t)
    else if (t <= asOf) (sum + w * math.pow(2.0, -(asOf - t).toDouble / halfLifeUs), asOf)
    else (rescale(sum, asOf, t) + w, t)
  }

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = {
    if (a._2 == Long.MinValue) b
    else if (b._2 == Long.MinValue) a
    else {
      val asOf = math.max(a._2, b._2)
      (rescale(a._1, a._2, asOf) + rescale(b._1, b._2, asOf), asOf)
    }
  }

  override def finish(b: (Double, Long)): (Double, Long) = b
  override def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(
    Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Double, Long)] = Encoders.tuple(
    Encoders.scalaDouble, Encoders.scalaLong)
}
