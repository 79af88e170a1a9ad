package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11c operator semantics beyond the oracle gate: the bitext
  * miner's mutual-best contract, the decontamination identities, the
  * theta-sketch exact-when-not-full rule, the skew audit's reconciled
  * statistics, and the boilerplate extractor's rule conjunction.
  */
class Round11cSpec extends AnyFunSuite {
  import TestSpark._

  test("bitext mining: one row per source, mutual pairs are y-side-unique") {
    val rows = SparkEntry.queries("n_bitext_mining")(spark, sf).collect()
    assert(rows.nonEmpty)
    // exactly one best-margin row per source vector
    val xids = rows.map(_.getLong(0))
    assert(xids.distinct.length == xids.length)
    // a target can be the mutual partner of at most one source —
    // mutual-best is an injective matching by construction
    val mutualYs = rows.filter(_.getInt(4) == 1).map(_.getLong(1))
    assert(mutualYs.distinct.length == mutualYs.length)
    // the fixture must exercise both arms: some mutual, and the
    // margin must actually reorder vs raw cosine for at least one x
    assert(rows.exists(_.getInt(4) == 1), "no mutual pairs mined")
  }

  test("semantic decontamination: identities reconcile") {
    val rows = SparkEntry.queries("n_decontam_semantic")(spark, sf).collect()
    assert(rows.nonEmpty)
    val corpusFlagged = rows.head.getLong(4)
    rows.foreach { r =>
      val (n, mx, leaked) = (r.getInt(1), r.getDouble(2), r.getInt(3))
      assert(leaked == (if (n > 0) 1 else 0))
      assert((mx >= 0.3) == (n > 0),
        s"bid ${r.getLong(0)}: max_sim $mx inconsistent with n_contaminated $n")
      assert(r.getLong(4) == corpusFlagged, "corpus_flagged must be constant")
    }
    // distinct flagged corpus vectors can't exceed the sum of
    // per-benchmark hits, and the fixture must have real leakage
    assert(corpusFlagged <= rows.map(_.getInt(1).toLong).sum)
    assert(corpusFlagged > 0, "fixture has no cosine>=0.3 pairs — threshold dead")
  }

  test("theta sketch: a non-full sketch IS the exact answer") {
    val r = SparkEntry.queries("n_theta_sketch_setops")(spark, sf).collect()(0)
    val (exactU, estU) = (r.getLong(1), r.getDouble(2))
    val (exactI, estI) = (r.getLong(4), r.getDouble(5))
    // sf0.001 key sets are far below k=128, so the sketch holds the
    // whole union and the KMV rule degrades to exact counting
    if (exactU < 128) {
      assert(estU == exactU.toDouble, s"non-full sketch must be exact: $estU vs $exactU")
      assert(estI == exactI.toDouble, s"non-full intersection must be exact: $estI vs $exactI")
      assert(r.getDouble(3) == 0.0 && r.getDouble(6) == 0.0)
    } else {
      // full sketch: the standard KMV error envelope (~1/sqrt(k-1),
      // asserted at 5 sigma)
      assert(r.getDouble(3) <= 0.45, s"err_union ${r.getDouble(3)}")
    }
    assert(exactI <= exactU)
  }

  test("skew audit: statistics reconcile with a direct recount") {
    val r = SparkEntry.queries("n_skew_audit")(spark, sf).collect()(0)
    val (nKeys, total) = (r.getLong(0), r.getLong(1))
    // direct recount of the key relation
    val cnts = T(spark, sf, "events").groupBy("user_id").count().collect()
    assert(nKeys == cnts.length)
    assert(total == cnts.map(_.getLong(1)).sum)
    val top1 = cnts.map(_.getLong(1)).max
    assert(math.abs(r.getDouble(2) - top1.toDouble / total) < 1e-9)
    val top10 = cnts.map(_.getLong(1)).sorted.takeRight(10).sum
    assert(math.abs(r.getDouble(3) - top10.toDouble / total) < 1e-9)
    // gini in [0,1), shares ordered, quantiles ordered
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
    assert(r.getDouble(3) >= r.getDouble(2))
    assert(r.getLong(6) >= r.getLong(5), "p99 < p50")
    // verdict is exactly its stated rule
    val expectFlag =
      top1.toDouble / total > 0.01 || r.getLong(6).toDouble / r.getLong(5) > 10
    assert(r.getInt(8) == (if (expectFlag) 1 else 0))
  }

  test("boilerplate extraction: counts and ratio respect the rule conjunction") {
    val rows = SparkEntry.queries("n_boilerplate_extract")(spark, sf).collect()
    assert(rows.nonEmpty)
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    rows.foreach { r =>
      val (nSeg, nGood, nProm) = (r.getInt(1), r.getInt(2), r.getInt(3))
      val ratio = r.getDouble(4)
      assert(nGood + nProm <= nSeg)
      assert(ratio >= 0.0 && ratio <= 1.0)
      // all segments kept <=> every token survives
      if (nGood + nProm == nSeg) assert(ratio == 1.0)
      // nothing kept <=> the clean digest is md5 of the empty string
      if (nGood + nProm == 0) assert(r.getString(5) == emptyMd5)
      else assert(r.getString(5) != emptyMd5)
    }
    // the battery must discriminate: some docs lose segments, the
    // neighborhood rule must fire somewhere
    assert(rows.exists(r => r.getInt(2) + r.getInt(3) < r.getInt(1)),
      "no boilerplate found — rules dead")
    assert(rows.exists(_.getInt(3) > 0), "promotion rule never fired")
  }
}
