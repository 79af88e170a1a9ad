package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11d operator semantics beyond the oracle gate: the
  * Bradley–Terry fit's bookkeeping identities, the kappa formula
  * against a direct recount, the domain gate's verdict arms, the
  * turn-structure invariants and the sampling recipe's monotonicity.
  */
class Round11dSpec extends AnyFunSuite {
  import TestSpark._

  test("bradley-terry: bookkeeping reconciles, strengths normalize") {
    val rows = SparkEntry.queries("n_pref_bradley_terry")(spark, sf).collect()
    assert(rows.nonEmpty)
    // ranks are a permutation of 1..k
    assert(rows.map(_.getInt(4)).sorted.toSeq == (1 to rows.length))
    // strengths positive and summing to ~1 (6-dp rounding slack)
    val strengths = rows.map(_.getDouble(3))
    assert(strengths.forall(_ > 0.0))
    assert(math.abs(strengths.sum - 1.0) < 1e-4, s"sum ${strengths.sum}")
    // total wins across items == total games / 2 (every comparison has
    // exactly one winner; each game is counted from both endpoints)
    val wins = rows.map(_.getLong(1)).sum
    val games = rows.map(_.getLong(2)).sum
    assert(games == 2 * wins, s"games $games vs wins $wins")
    // rank order follows strength with item tiebreak
    val byRank = rows.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq
    assert(byRank == byRank.sorted.reverse)
  }

  test("kappa: formula identity against a direct recount") {
    val r = SparkEntry.queries("n_kappa_agreement")(spark, sf).collect()(0)
    val (n, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n11 + n10 + n01 + n00 == n)
    // direct recount of annotator A from the raw table
    val docs = T(spark, sf, "documents").collect()
    val aPos = docs.count(_.getAs[Long]("n_chars") >= 300)
    assert(n11 + n10 == aPos, s"A-positive recount $aPos vs ${n11 + n10}")
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)).toDouble / (n.toDouble * n)
    assert(math.abs(r.getDouble(7) - (po - pe) / (1 - pe)) < 1e-5)
    assert(r.getDouble(7) >= -1.0 && r.getDouble(7) <= 1.0)
    // the fixture's annotators must actually agree beyond chance
    assert(r.getDouble(7) > 0.2, "kappa too low — annotators uncorrelated")
  }

  test("domain reputation: every verdict arm fires and is honored") {
    val rows = SparkEntry.queries("n_domain_gate_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    val verdicts = rows.map(_.getString(6)).toSet
    assert(verdicts == Set("keep", "downsample", "drop"),
      s"fixture exercises only $verdicts")
    rows.foreach { r =>
      val (nDocs, kept) = (r.getLong(1), r.getLong(7))
      r.getString(6) match {
        case "keep" => assert(kept == nDocs)
        case "drop" => assert(kept == 0L)
        case "downsample" =>
          assert(kept > 0L && kept < nDocs,
            s"${r.getString(0)}: downsample kept $kept of $nDocs")
      }
      assert(math.abs(r.getDouble(8) - kept.toDouble / nDocs) < 1e-9)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("turn structure: invariants and a hand-recounted conversation") {
    val rows = SparkEntry.queries("n_turn_structure")(spark, sf).collect()
    assert(rows.nonEmpty)
    val evTotal = T(spark, sf, "events").count()
    assert(rows.map(_.getLong(1)).sum == evTotal)
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= r.getLong(1))
      assert(Set("user", "assistant")(r.getString(5)))
      assert(Set("user", "assistant")(r.getString(6)))
      assert(r.getLong(3) + r.getLong(4) >= 1)
      // strict alternation <=> as many turns as events
      assert((r.getInt(7) == 1) == (r.getInt(2).toLong == r.getLong(1)))
    }
    // hand-recount the first user's run structure
    import org.apache.spark.sql.functions._
    val uid = rows.head.getLong(0)
    val seq = T(spark, sf, "events").filter(col("user_id") === uid)
      .orderBy(col("ts"), col("event_id"))
      .select(col("event_type")).collect()
      .map(r => if (Set("click", "view", "signup")(r.getString(0))) "user"
                else "assistant").toList
    val runs = seq.foldLeft(List.empty[(String, Int)]) {
      case ((h, c) :: t, r) if h == r => (h, c + 1) :: t
      case (acc, r) => (r, 1) :: acc
    }
    assert(rows.head.getInt(2) == runs.length)
    assert(rows.head.getLong(3) ==
      runs.filter(_._1 == "user").map(_._2).maxOption.getOrElse(0).toLong)
    assert(rows.head.getString(5) == runs.last._1) // runs is reversed
  }

  test("language sampling: alpha-smoothing flattens toward uniform") {
    val rows = SparkEntry.queries("n_lang_sampling_temp")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (ps, qs) = (rows.map(_.getDouble(3)), rows.map(_.getDouble(4)))
    assert(math.abs(qs.sum - 1.0) < 1e-4)
    // smoothing strictly flattens: the q-share order matches the
    // p-share order but with smaller spread
    assert(qs.max - qs.min < ps.max - ps.min)
    // low-resource languages are upsampled, the head is downsampled
    val byP = rows.sortBy(_.getDouble(3))
    assert(byP.head.getDouble(5) > 1.0, "rarest lang not upsampled")
    assert(byP.last.getDouble(5) < 1.0, "head lang not downsampled")
    // upsample multipliers are antitone in p
    val mults = byP.map(_.getDouble(5)).toSeq
    assert(mults == mults.sorted.reverse)
    // expected docs re-distribute the same corpus
    val tot = rows.head.getLong(2)
    assert(math.abs(rows.map(_.getDouble(6)).sum - tot) < tot * 1e-3)
  }
}
