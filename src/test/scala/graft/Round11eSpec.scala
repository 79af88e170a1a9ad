package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11e operator semantics beyond the oracle gate: the
  * Fellegi–Sunter score's monotonicity in agreements, the DoReMi
  * step's mass-conservation and direction, the encoding audit's
  * planted-artifact detection, and the packing curve's accounting
  * identities.
  */
class Round11eSpec extends AnyFunSuite {
  import TestSpark._

  test("record linkage: score is monotone in agreements, verdicts honor it") {
    val rows = SparkEntry.queries("n_record_linkage")(spark, sf).collect()
    assert(rows.nonEmpty)
    // same agreement pattern => same score (weights are pattern functions)
    val byPattern = rows.groupBy(r => (r.getInt(4), r.getInt(5), r.getInt(6)))
    byPattern.foreach { case (pat, rs) =>
      assert(rs.map(_.getDouble(7)).distinct.length == 1,
        s"pattern $pat has multiple scores")
    }
    // adding an agreement never lowers the score (each field weight is
    // higher on agree than disagree — u < m by construction)
    val score = byPattern.map { case (p, rs) => p -> rs.head.getDouble(7) }
    for {
      ((t, h, pr), s0) <- score
      bumped <- Seq((1, h, pr), (t, 1, pr), (t, h, 1))
      s1 <- score.get(bumped)
    } assert(s1 >= s0, s"agreement bump $bumped lowered score $s0 -> $s1")
    // verdict thresholds are honored exactly
    rows.foreach { r =>
      val s = r.getDouble(7)
      val expect = if (s >= 4.0) "match" else if (s >= 0.0) "possible"
                   else "non_match"
      assert(r.getString(8) == expect)
    }
    // the fixture must exercise at least two verdict arms
    assert(rows.map(_.getString(8)).toSet.size >= 2)
    // pairs only within blocks: recount one block directly
    val first = rows.head
    val (brand, size) = (first.getString(2), first.getInt(3))
    val blockParts = T(spark, sf, "part")
      .where(s"p_brand = '$brand' and p_size = $size").count()
    val blockPairs = rows.count(r =>
      r.getString(2) == brand && r.getInt(3) == size)
    assert(blockPairs == blockParts * (blockParts - 1) / 2)
  }

  test("doremi: weights conserve mass and move in the excess direction") {
    val rows = SparkEntry.queries("n_doremi_reweight")(spark, sf).collect()
    assert(rows.length > 1)
    val (olds, news) = (rows.map(_.getDouble(2)), rows.map(_.getDouble(5)))
    assert(math.abs(olds.sum - 1.0) < 1e-4)
    assert(math.abs(news.sum - 1.0) < 1e-4)
    assert(news.forall(_ > 0.0))
    // positive excess (hard domain) gains weight, negative sheds it —
    // up to the normalizer shift: the domain with max excess must gain,
    // the one with min excess must lose
    val byExcess = rows.sortBy(_.getDouble(4))
    assert(byExcess.last.getDouble(6) > 0.0, "hardest domain did not gain")
    assert(byExcess.head.getDouble(6) < 0.0, "easiest domain did not shed")
    // deltas sum to ~0 (mass conservation restated)
    assert(math.abs(rows.map(_.getDouble(6)).sum) < 1e-4)
  }

  test("encoding audit: planted artifacts are detected, clean docs are clean") {
    val rows = SparkEntry.queries("n_encoding_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every source has planted artifacts (doc_id mod 11/13/17/19 hits
    // every 20-doc source slice with overwhelming probability at sf0.01)
    val total = rows.map(_.getLong(1)).sum
    val affected = rows.map(_.getLong(2)).sum
    // global affected share ~= P(divisible by 11, 13, 17 or 19) ~ 0.23
    val expected = total * (1.0 - (1.0 - 1.0 / 11) * (1.0 - 1.0 / 13)
      * (1.0 - 1.0 / 17) * (1.0 - 1.0 / 19))
    assert(math.abs(affected - expected) < total * 0.05,
      s"affected $affected vs expected ~$expected")
    // artifact-char classes all fire somewhere
    assert(rows.map(_.getLong(3)).sum > 0, "no replacement chars found")
    assert(rows.map(_.getLong(4)).sum > 0, "no mojibake found")
    assert(rows.map(_.getLong(5)).sum > 0, "no NBSP found")
    assert(rows.map(_.getLong(6)).sum > 0, "no control chars found")
    // mojibake plants exactly one 0xC3 per hit doc; NBSP exactly two
    val docs = T(spark, sf, "documents").count()
    val mojiDocs = (0L until docs).count(_ % 11 == 0)
    assert(rows.map(_.getLong(4)).sum == mojiDocs)
    val nbspDocs = (0L until docs).count(_ % 17 == 0)
    assert(rows.map(_.getLong(5)).sum == 2L * nbspDocs)
  }

  test("packing curve: accounting identities hold at every context length") {
    val rows = SparkEntry.queries("n_packing_efficiency")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (ctx, nDocs, total, kept, trunc, chunks) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      assert(kept + trunc == total, "kept + truncated != total")
      assert(chunks == (total + ctx - 1) / ctx)
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
      assert(r.getDouble(8) > 0.0 && r.getDouble(8) <= 1.0)
      // packed utilization dominates one-doc-per-sequence utilization
      assert(r.getDouble(8) >= r.getDouble(6) - 1e-9,
        s"packing lost to padding at ctx=$ctx")
      assert(nDocs > 0 && total > 0)
    }
    // truncation loss is antitone in context length; padding waste
    // (1 - util) is monotone in context length for fixed docs
    val byCtx = rows.sortBy(_.getLong(0))
    val losses = byCtx.map(_.getDouble(7)).toSeq
    assert(losses == losses.sorted.reverse, "trunc loss not antitone in ctx")
  }
}
