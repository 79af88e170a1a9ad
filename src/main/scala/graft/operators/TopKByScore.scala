package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bounded top-k by (score desc, id asc): the k-entry summary
  * shape that makes exact weighted top-k feasible on an unbounded
  * stream — each partition/shard reduces to at most k entries before
  * anything crosses the wire, and summaries merge associatively.
  * Unlike Misra-Gries this is EXACT for top-k selection: any element of
  * the global top-k is necessarily in its shard's top-k, so flattening
  * shard summaries and re-selecting k reproduces the batch answer.
  */
final case class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    trim(b :+ a)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
