package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog register file (Flajolet-Fuchs-Gandouet-
  * Meunier 2007), the fixed-size dual of [[KmvSketch]]: the buffer is
  * m = 64 max-registers; an arriving 52-bit hash updates register
  * (h % 64) with the leading-zero rank of the remaining 46 bits.
  *
  * The merge law is elementwise MAX — associative, commutative,
  * idempotent — so shard/stream merges reproduce the single-pass
  * register file EXACTLY (not approximately): StreamingSpec drains
  * per-shard register files and proves the merged estimate equals the
  * batch n_hll_distinct value bit-for-bit. Estimation mirrors the
  * batch query: harmonic mean with alpha_64 = 0.709 and the
  * small-range linear-counting correction.
  *
  * State bound: 64 ints per shard, however long the feed runs.
  */
final case class HllSketch() extends Aggregator[Long, Seq[Int], Seq[Int]] {
  import HllSketch._

  override def zero: Seq[Int] = Seq.fill(M)(0)
  override def reduce(b: Seq[Int], hv: Long): Seq[Int] = {
    val j = (hv % M).toInt
    val r = rho(hv / M)
    if (r <= b(j)) b else b.updated(j, r)
  }
  override def merge(a: Seq[Int], b: Seq[Int]): Seq[Int] =
    a.lazyZip(b).map(math.max)
  override def finish(b: Seq[Int]): Seq[Int] = b
  override def bufferEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}

object HllSketch {
  /** Register count (2^6) — matches the batch n_hll_distinct query. */
  val M: Int = 64

  /** Leading-zero rank of the 46-bit remainder: 47 - bitlength(r),
    * i.e. rho(0) = 47 — identical to the batch/oracle construction
    * `47 - len(ltrim(bin(hv // 64), '0'))`.
    */
  def rho(r: Long): Int = 47 - (64 - java.lang.Long.numberOfLeadingZeros(r))

  /** The HLL estimate for a (merged) register file, mirroring the
    * batch query expression for expression: alpha_64 * m^2 over the
    * 2^-M harmonic sum, with linear counting below 2.5m when empty
    * registers remain.
    */
  def estimate(regs: Seq[Int]): Double = {
    val ss = regs.map(m => math.pow(2.0, -m)).sum
    val zeros = regs.count(_ == 0)
    val raw = 0.709 * M * M / ss
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }
}
