package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bottom-k SAMPLE (the quantile-sketch state of
  * n_quantile_sketch): where [[KmvSketch]] keeps only the k smallest
  * hashes (cardinality), this keeps the k smallest (hash, value)
  * PAIRS — a deterministic uniform sample of the value stream that
  * merges across shards/streams by keeping the k smallest of the
  * union (associative, commutative, duplicate-absorbing on the hash
  * key). Draining a shard set and re-merging therefore reproduces the
  * single-pass sample — and any quantile estimate over it — exactly
  * (StreamingSpec proves it against the batch n_quantile_sketch).
  *
  * State bound: k (hash, value) pairs per shard, however long the
  * feed runs.
  */
final case class SampleSketch(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def trim(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.distinctBy(_._1).sortBy(_._1).take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty
  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    if (b.length == k && a._1 >= b.last._1) b
    else trim(b :+ a)
  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)
  override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

object SampleSketch {
  /** The h = p(n-1) interpolated quantile over a (merged) sample —
    * the same rule the batch query and DuckDB's quantile_cont use.
    */
  def quantile(sample: Seq[(Long, Double)], p: Double): Double = {
    val vs = sample.map(_._2).sorted
    val h = p * (vs.length - 1)
    val (lo, hi) = (vs(math.floor(h).toInt), vs(math.ceil(h).toInt))
    lo + (hi - lo) * (h - math.floor(h))
  }
}
