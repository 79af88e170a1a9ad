package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable KMV (k minimum values / bottom-k, the Theta-sketch
  * construction) cardinality summary: the buffer holds the k smallest
  * DISTINCT hash values seen, sorted ascending. Dedup happens inside
  * the aggregator — feeding the raw multiset is fine, which is what
  * makes it streamable without a stateful dropDuplicates in front.
  *
  * Estimation rule (see [[KmvSketch.estimate]]): a non-full sketch IS
  * the exact distinct count; a full sketch estimates (k-1)/u_k with
  * u_k the k-th smallest hash normalized to [0,1). Summaries merge by
  * keeping the k smallest of the distinct union — associative and
  * commutative, so shard/stream merges reproduce the single-pass
  * sketch exactly (Round10Spec + StreamingSpec prove it).
  *
  * State bound: k longs per shard, however long the feed runs.
  */
final case class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def trim(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty
  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length == k && a >= b.last) b // fast path: can't enter the sketch
    else trim(b :+ a)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)
  override def finish(b: Seq[Long]): Seq[Long] = b
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {
  /** 2^52 — the hash domain size for the portable 52-bit md5 prefix. */
  val Domain: Double = 4503599627370496.0

  /** The KMV estimate for a (merged) sketch of capacity k. */
  def estimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / (sketch.last.toDouble / Domain)
}
