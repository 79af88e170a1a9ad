package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11g operator semantics beyond the oracle gate: the
  * leave-one-out influence direction and identity, tau-b's bounds
  * and pair accounting, and the epoch plan's budget arithmetic.
  */
class Round11gSpec extends AnyFunSuite {
  import TestSpark._

  test("loo influence: removal never helps, influence is non-negative-ish and bounded") {
    val rows = SparkEntry.queries("n_loo_domain_influence")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bptIn, bptLoo, infl) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // removing a source can only make its own tokens HARDER to model
      // (its counts leave the model): bpt_loo >= bpt_in, up to the 6-dp
      // rounding of both operands
      assert(bptLoo >= bptIn - 1e-6,
        s"${r.getString(0)}: removal made the source easier?! $bptIn -> $bptLoo")
      assert(infl >= -1e-6 && infl < 20.0)
      assert(bptIn > 0.0 && bptIn < 64.0)
    }
    // the verdict arms follow the documented thresholds
    rows.foreach { r =>
      val expect = if (r.getDouble(4) >= 0.5) "load_bearing"
                   else if (r.getDouble(4) >= 0.1) "useful" else "redundant"
      assert(r.getString(5) == expect)
    }
  }

  test("kendall: pair accounting closes, tau_b in [-1, 1], recount on a sample") {
    val r = SparkEntry.queries("n_quality_kendall")(spark, sf).collect().head
    val (n, c, d, tx, ty) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    // concordant + discordant + (pairs tied in x) >= all pairs where
    // the classifier assigned cd = 0 — exact closure: cd=0 iff tied in
    // x or (not tied in x but tied in y); tx counts ALL x-ties
    assert(c + d <= n && tx <= n && ty <= n)
    assert(n == 300L * 299 / 2)
    val tau = r.getDouble(5)
    assert(tau >= -1.0 && tau <= 1.0)
    // direct recount of tau_b from the scored slice
    import org.apache.spark.sql.functions._
    val scored = T(spark, sf, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
      .select(
        round(expr("aggregate(ws, 0L, (a, w) -> a + length(w))")
          .cast("double") / size(col("ws")), 6).as("s1"),
        round(size(array_distinct(col("ws"))).cast("double")
          / size(col("ws")), 6).as("s2"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    var (cc, dd) = (0L, 0L)
    for (i <- scored.indices; j <- (i + 1) until scored.length) {
      val ((x1, y1), (x2, y2)) = (scored(i), scored(j))
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) cc += 1 else dd += 1
      }
    }
    assert(cc == c && dd == d, s"recount ($cc,$dd) != query ($c,$d)")
  }

  test("mixture epochs: allocation arithmetic and the repetition cliff") {
    val rows = SparkEntry.queries("n_mixture_epochs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val budgets = rows.map(_.getLong(0)).distinct.sorted
    assert(budgets.sameElements(Array(10000L, 100000L, 1000000L)))
    rows.foreach { r =>
      val (budget, tokens, w, alloc, epochs) = (r.getLong(0), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(alloc - budget * w) < 0.51)
      assert(math.abs(epochs - budget * w / tokens) < 1e-5)
      val expect = if (epochs > 4.0) "repetition_cliff"
                   else if (epochs > 1.0) "repeats" else "fresh"
      assert(r.getString(6) == expect)
    }
    // epochs scale linearly with budget for a fixed source
    val bySource = rows.groupBy(_.getString(1))
    bySource.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(0))
      val e = sorted.map(_.getDouble(5))
      assert(math.abs(e(1) / e(0) - 10.0) < 0.01)
      assert(math.abs(e(2) / e(1) - 10.0) < 0.01)
    }
    // the fixture's budget grid must actually exercise the cliff
    assert(rows.exists(_.getString(6) == "repetition_cliff"))
    assert(rows.exists(_.getString(6) == "fresh"))
  }
}
