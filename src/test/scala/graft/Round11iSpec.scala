package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11i semantics beyond the oracle gate: triad accounting
  * against a brute-force recount, and the trimmed mean's robustness
  * direction.
  */
class Round11iSpec extends AnyFunSuite {
  import TestSpark._

  test("preference consistency: triad counts match a brute-force recount") {
    val r = SparkEntry.queries("n_pref_consistency")(spark, sf).collect().head
    val (nEdges, cyc, trans) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // recount from the majority edge relation built directly
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    val comps = T(spark, sf, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("prev_type").isNotNull
        && col("prev_type") =!= col("event_type")
        && col("value") =!= col("prev_value"))
      .select(
        when(col("value") > col("prev_value"), col("event_type"))
          .otherwise(col("prev_type")).as("winner"),
        when(col("value") > col("prev_value"), col("prev_type"))
          .otherwise(col("event_type")).as("loser"))
      .collect().map(x => (x.getString(0), x.getString(1)))
    val net = scala.collection.mutable.Map[(String, String), Long]()
    comps.foreach { case (win, lose) =>
      val k = if (win < lose) (win, lose) else (lose, win)
      net(k) = net.getOrElse(k, 0L) + (if (win < lose) 1 else -1)
    }
    // note: .toSeq first — collect on a Map producing tuples would
    // re-key and silently collapse duplicate sources
    val edges = net.toSeq.collect {
      case ((lo, hi), n) if n > 0 => (lo, hi)
      case ((lo, hi), n) if n < 0 => (hi, lo)
    }.toSet
    assert(edges.size.toLong == nEdges)
    val items = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var (c0, t0) = (0L, 0L)
    for (a <- items; b <- items; c <- items
         if a != b && b != c && a != c) {
      if (edges((a, b)) && edges((b, c)) && edges((c, a)) && a < b && a < c) c0 += 1
      if (edges((a, b)) && edges((b, c)) && edges((a, c))) t0 += 1
    }
    assert(c0 == cyc, s"cyclic recount $c0 != $cyc")
    assert(t0 == trans, s"transitive recount $t0 != $trans")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getString(4) == (if (cyc == 0) "consistent" else "cyclic_preferences"))
  }

  test("trimmed stats: the trim keeps the middle and bounds the mean") {
    val rows = SparkEntry.queries("n_trimmed_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == n - 2 * (n / 10), s"${r.getString(0)}: kept $kept of $n")
      // trimming both tails keeps the mean between the raw min/max —
      // and for a right-skewed length distribution pulls it DOWN or
      // holds it; assert the weaker always-true bound: trimmed mean is
      // between the 10th and 90th percentile means, i.e. finite + sane
      assert(r.getDouble(4) > 0.0)
      assert(math.abs(r.getDouble(5)) < 1.0, "relative shift >100%?!")
    }
  }
}
