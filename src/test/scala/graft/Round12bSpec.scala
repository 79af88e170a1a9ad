package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12b semantic checks — corpus-growth and ranking-agreement
  * analytics. Cross-engine VALUE correctness is the oracle gate's job;
  * these pin the properties the numbers must satisfy to mean what the
  * doc strings claim.
  */
class Round12bSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("heaps law: curve is monotone, sublinear, and the fit is a real power law") {
    val rows = SparkEntry.queries("n_heaps_law")(spark, dir)
      .orderBy(col("doc_cap")).collect()
    assert(rows.length >= 4, "need >=4 doubling checkpoints for a fit")
    val grams = rows.map(_.getAs[Long]("n_grams"))
    val types = rows.map(_.getAs[Long]("n_types"))
    assert(grams.sameElements(grams.sorted) && types.sameElements(types.sorted),
      "cumulative curve must be monotone")
    assert(types.zip(grams).forall { case (v, n) => v <= n },
      "type count cannot exceed gram count")
    val beta = rows.head.getAs[Double]("beta")
    assert(rows.forall(_.getAs[Double]("beta") == beta), "fit must be constant across rows")
    assert(beta > 0.0 && beta < 1.0,
      s"Heaps exponent must be sublinear-positive, got $beta")
    // the fitted line actually tracks the curve: every checkpoint's
    // predicted ln V is within 25% relative of the observed ln V
    val lnK = rows.head.getAs[Double]("ln_k")
    rows.foreach { r =>
      val pred = lnK + beta * math.log(r.getAs[Long]("n_grams").toDouble)
      val obs = math.log(r.getAs[Long]("n_types").toDouble)
      assert(math.abs(pred - obs) / obs < 0.25,
        s"fit misses checkpoint ${r.get(0)}: pred=$pred obs=$obs")
    }
  }

  test("lm transfer matrix: k*k complete, diagonal gap zero, entropies positive") {
    val rows = SparkEntry.queries("n_lm_transfer_matrix")(spark, dir).collect()
    val k = rows.map(_.getAs[String]("train_source")).distinct.length
    assert(rows.length == k * k, s"matrix incomplete: ${rows.length} != $k^2")
    rows.foreach { r =>
      assert(r.getAs[Double]("cross_entropy") > 0.0)
      if (r.getAs[String]("train_source") == r.getAs[String]("eval_source"))
        assert(r.getAs[Double]("transfer_gap") == 0.0,
          s"diagonal gap nonzero for ${r.get(0)}")
    }
    // the gap column is consistent: gap = H(eval|train) - H(eval|eval)
    val self = rows.filter(r => r.getAs[String]("train_source") == r.getAs[String]("eval_source"))
      .map(r => r.getAs[String]("eval_source") -> r.getAs[Double]("cross_entropy")).toMap
    rows.foreach { r =>
      val expected = BigDecimal(r.getAs[Double]("cross_entropy") - self(r.getAs[String]("eval_source")))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("transfer_gap") - expected) < 1e-9)
    }
  }

  test("ndcg: bounded by ideal, in [0,1], grade counts consistent with the label distribution") {
    val rows = SparkEntry.queries("n_ndcg_eval")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val dcg = r.getAs[Double]("dcg"); val idcg = r.getAs[Double]("idcg")
      val ndcg = r.getAs[Double]("ndcg")
      assert(dcg >= 0.0 && dcg <= idcg + 1e-9, s"dcg $dcg exceeds ideal $idcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_rel2") > 0, "every probe has same-label candidates at sf0.01")
    }
    // probe 0's grade-2 count equals the corpus count of its label minus itself
    val lab0 = T(spark, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("label")).collect().head.getInt(0)
    val n2 = T(spark, dir, "embeddings")
      .filter(col("label") === lab0 && col("vec_id") =!= 0).count()
    assert(rows.find(_.getAs[Long]("vec_id") == 0L).get.getAs[Long]("n_rel2") == n2)
  }

  test("rbo: in [0,1], overlap bounded by depth, and full-agreement RBO would be ~1") {
    val r = SparkEntry.queries("n_quality_rbo")(spark, dir).collect().head
    val rbo = r.getAs[Double]("rbo")
    assert(rbo >= 0.0 && rbo <= 1.0, s"rbo out of range: $rbo")
    val overlap = r.getAs[Long]("overlap_at_depth")
    assert(overlap >= 0L && overlap <= 50L)
    assert(r.getAs[Long]("n_docs") == 300L)
    // identical rankings would score sum(w_d)*0.1 = 1 - 0.9^50 (truncated
    // RBO's own upper bound); the two scorers must sit strictly below it
    val maxRbo = 1.0 - math.pow(0.9, 50)
    assert(rbo < maxRbo, s"rbo $rbo cannot reach the truncated upper bound $maxRbo")
  }
}
