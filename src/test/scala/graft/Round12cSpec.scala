package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12c semantic checks — statistical-rigor operators. Value
  * correctness is the oracle gate's job; these pin the statistical
  * properties the numbers must satisfy.
  */
class Round12cSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("conformal gate: exact order-statistic threshold, k formula, flag rate near alpha") {
    val r = SparkEntry.queries("n_conformal_quality_gate")(spark, dir).collect().head
    val nCal = r.getAs[Long]("n_cal"); val k = r.getAs[Long]("k")
    assert(nCal == 200L)
    assert(k == (9 * (nCal + 1) + 9) / 10, s"k=$k is not ceil(0.9*(n_cal+1))")
    // the threshold IS the k-th largest calibration score: at least k
    // calibration docs sit at or above it, fewer than k strictly above
    val thr = r.getAs[Double]("threshold")
    val cal = T(spark, dir, "documents").filter(col("doc_id") < 200)
      .select(round(size(array_distinct(split(col("text"), " "))).cast("double")
        / size(split(col("text"), " ")), 6).as("s"))
    assert(cal.filter(col("s") >= thr).count() >= k)
    assert(cal.filter(col("s") > thr).count() < k)
    // exchangeable apply slice: flag rate concentrates near alpha=0.1
    val rate = r.getAs[Double]("flag_rate")
    assert(rate > 0.02 && rate < 0.25, s"flag rate $rate far from alpha=0.1")
  }

  test("hill tail fit: positive exponents, order statistics consistent across depths") {
    val rows = SparkEntry.queries("n_hill_tail_fit")(spark, dir)
      .orderBy(col("k")).collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == Seq(10, 20, 40))
    rows.foreach { r =>
      val a = r.getAs[Double]("alpha_hill")
      assert(a > 0.0 && !a.isInfinite, s"k=${r.get(0)}: alpha $a")
    }
    // f_(k+1) is non-increasing in k (they are order statistics)
    val cuts = rows.map(_.getAs[Long]("f_cut"))
    assert(cuts.zip(cuts.tail).forall { case (a, b) => a >= b })
  }

  test("bootstrap CI: contains the full-slice mean, ranks consistent, deterministic reruns") {
    val r = SparkEntry.queries("n_bootstrap_ci")(spark, dir).collect().head
    assert(r.getAs[Long]("n_docs") == 300L && r.getAs[Long]("n_boot") == 50L)
    val (lo, hi, m) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
      r.getAs[Double]("mean_full"))
    assert(lo <= hi)
    assert(lo <= m && m <= hi, s"CI [$lo, $hi] misses the mean $m")
    assert(r.getAs[Double]("se_boot") > 0.0)
    // MD5-seeded draws: a second run reproduces the row bit-for-bit
    val r2 = SparkEntry.queries("n_bootstrap_ci")(spark, dir).collect().head
    assert(r.toSeq == r2.toSeq, "bootstrap is not deterministic across runs")
  }
}
