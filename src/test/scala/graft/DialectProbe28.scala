package graft

import graft.server.Dialect

/** Round-12 probe tier 28: the window-function long tail — ntile
  * bucketing, percent_rank/cume_dist tie handling, rank gaps,
  * lead with default, negative-offset lag, nth_value, RANGE value
  * frames, keyed running RANGE sums. DuckDB ground truth run
  * 2026-08-15: everything matches and is pinned in DialectSpec
  * probe-28. ntile(0) is loud on both engines; the one non-matching
  * edge is a DEGENERATE always-empty EXCLUDE frame (ROWS BETWEEN
  * CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW -> NULL there,
  * loud rewrite error here) — the EXCLUDE rewrite covers the real
  * frame shapes (probe-14/E-row pins); the empty-by-construction
  * frame stays loud.
  */
object DialectProbe28 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    Seq(
      "SELECT x, ntile(3) OVER (ORDER BY x) AS n FROM (VALUES (1),(2),(3),(4),(5)) t(x) ORDER BY x",
      "SELECT x, percent_rank() OVER (ORDER BY x) AS p, cume_dist() OVER (ORDER BY x) AS c FROM (VALUES (1),(2),(2),(4)) t(x) ORDER BY x, p",
      "SELECT x, rank() OVER (ORDER BY x) r, dense_rank() OVER (ORDER BY x) d FROM (VALUES (1),(2),(2),(4)) t(x) ORDER BY x, r",
      "SELECT x, lead(x, 2, -1) OVER (ORDER BY x) AS l FROM (VALUES (1),(2),(3)) t(x) ORDER BY x",
      "SELECT x, nth_value(x, 2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv FROM (VALUES (1),(2),(3)) t(x) ORDER BY x",
      "SELECT x, first_value(x) OVER (ORDER BY x RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS f FROM (VALUES (1),(3),(4)) t(x) ORDER BY x",
      "SELECT x, lag(x, -1) OVER (ORDER BY x) AS neg FROM (VALUES (1),(2),(3)) t(x) ORDER BY x",
      "SELECT x, avg(x) OVER (ORDER BY x ROWS BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW) AS e FROM (VALUES (1),(2)) t(x) ORDER BY x",
      "SELECT x, ntile(0) OVER (ORDER BY x) AS n FROM (VALUES (1)) t(x)",
      "SELECT x, sum(x) OVER (PARTITION BY x % 2 ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) s FROM (VALUES (1),(2),(3),(4)) t(x) ORDER BY x"
    ).foreach { sql =>
      try {
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(100)}\n  -> ${rows.mkString("; ").take(180)}")
      } catch { case e: Throwable =>
        println(s"ERR : ${sql.take(100)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(140)}")
      }
    }
  }
}
