package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Count-Min sketch (Cormode–Muthukrishnan) over a token
  * stream: the buffer is the full d×w counter array (flat, row-major),
  * updates increment one cell per hash row, and summaries merge by
  * cellwise addition — the property that makes CMS the shard/stream
  * frequency sketch. Hash positions are the SAME portable md5-52-bit
  * construction as the batch n_cms_freq query (`graft-cms-<i>:<token>`),
  * so a drained stream's merged cells equal the batch sketch relation
  * EXACTLY, cell for cell (StreamingSpec proves it).
  *
  * State bound: d·w longs per shard (8 KiB at 4×256), however many
  * tokens flow through.
  */
final case class CmsSketch(d: Int = 4, w: Int = 256)
    extends Aggregator[String, Array[Long], Array[Long]] {

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  private def h52(s: String): Long = {
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 13)
    java.lang.Long.parseLong(hex, 16)
  }

  /** The d cell columns for a token — identical to the batch query's
    * `conv(substr(md5('graft-cms-<i>:'||tok),1,13),16,10) % w`.
    */
  def positions(tok: String): Array[Int] =
    Array.tabulate(d)(i => (h52(s"graft-cms-$i:$tok") % w).toInt)

  override def zero: Array[Long] = new Array[Long](d * w)
  override def reduce(b: Array[Long], tok: String): Array[Long] = {
    val pos = positions(tok)
    var i = 0
    while (i < d) { b(i * w + pos(i)) += 1; i += 1 }
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CmsSketch {
  /** Point estimate: min over rows of the token's cells. */
  def estimate(cells: Array[Long], tok: String, d: Int = 4, w: Int = 256): Long = {
    val sk = CmsSketch(d, w)
    sk.positions(tok).zipWithIndex.map { case (c, i) => cells(i * w + c) }.min
  }
}
