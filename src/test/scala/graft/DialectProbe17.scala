package graft

import graft.server.Dialect

/** Round-11 probe tier 17: the aggregate long tail — quantile list
  * forms, disc vs cont, ordered first/last/any_value, favg/fsum,
  * entropy base, histogram map, bit aggregates, product, bool
  * aggregates, in-aggregate ORDER BY on a foreign key for quantiles.
  * DuckDB ground truth pinned alongside each case (run 2026-08-15).
  */
object DialectProbe17 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: [1.7, 2.5, 3.2] (DECIMAL list for decimal input)
      "SELECT quantile_cont(x, [0.25, 0.5, 0.75]) AS q FROM (VALUES (1.0),(2.0),(3.0),(4.0)) t(x)",
      // duck: 2.5 DOUBLE, 2 INTEGER (disc = lower of the straddle)
      "SELECT quantile_cont(x, 0.5) AS m, quantile_disc(x, 0.5) AS d FROM (VALUES (1),(2),(3),(4)) t(x)",
      // duck: 2.5 DOUBLE
      "SELECT median(x) AS m FROM (VALUES (1),(2),(3),(4)) t(x)",
      // duck: 1 (ties -> smallest)
      "SELECT mode(x) AS m FROM (VALUES (1),(1),(2),(2),(3)) t(x)",
      // duck: 3, 3
      "SELECT first(x ORDER BY y DESC) AS f, last(x ORDER BY y) AS l FROM (VALUES (1,1),(2,2),(3,3)) t(x,y)",
      // duck: 3 (ordered any_value)
      "SELECT any_value(x ORDER BY x DESC) AS a FROM (VALUES (1),(3),(2)) t(x)",
      // duck: true, true
      "SELECT bool_and(x > 0) AS a, bool_or(x > 2) AS b FROM (VALUES (1),(2),(3)) t(x)",
      // duck: 24.0
      "SELECT product(x) AS p FROM (VALUES (2.0),(3.0),(4.0)) t(x)",
      // duck: 8, 14, 6
      "SELECT bit_and(x) AS a, bit_or(x) AS o, bit_xor(x) AS r FROM (VALUES (12),(10)) t(x)",
      // duck: [3,2,1]
      "SELECT list(x ORDER BY x DESC) AS l FROM (VALUES (1),(3),(2)) t(x)",
      // duck: 'a-b'
      "SELECT string_agg(x, '-' ORDER BY x) AS s FROM (VALUES ('b'),('a')) t(x)",
      // duck: 2.0, 4.0 (Kahan-compensated forms)
      "SELECT favg(x) AS f, fsum(x) AS s FROM (VALUES (1.5),(2.5)) t(x)",
      // duck: {1=2, 2=1}
      "SELECT histogram(x) AS h FROM (VALUES (1),(1),(2)) t(x)",
      // duck: 1.5 (log2 base)
      "SELECT entropy(x) AS e FROM (VALUES (1),(1),(2),(3)) t(x)",
      // duck: 1.5 (quantile of x along y's order — same value set here)
      "SELECT quantile_cont(x, 0.5 ORDER BY y) AS q FROM (VALUES (1,1),(2,2)) t(x,y)")
    var fails = 0
    cases.foreach { sql =>
      try {
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(110)}\n  -> ${rows.mkString("; ").take(200)}")
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(110)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(160)}")
      }
    }
    println(s"probe17 done: ${cases.size - fails}/${cases.size} ok")
  }
}
