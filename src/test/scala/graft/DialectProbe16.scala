package graft

import graft.server.Dialect

/** Round-11 probe tier 16: temporal arithmetic typing (DATE - DATE,
  * DATE ± INT, TIMESTAMP - TIMESTAMP, DATE + INTERVAL), map subscript
  * / element_at list-wrapping, map key order, struct/list comparison,
  * binary string collation, nullif/ifnull. DuckDB ground truth pinned
  * alongside each case (run 2026-08-15).
  */
object DialectProbe16 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: BIGINT 6 (Spark yields INTERVAL '6' DAY — flipped by sqlServed)
      "SELECT DATE '2024-03-05' - DATE '2024-02-28' AS a",
      // duck: the integer-typed difference composes with arithmetic
      "SELECT (DATE '2024-03-05' - DATE '2024-02-28') + 5 AS a",
      // duck: DATE, DATE
      "SELECT DATE '2024-03-05' + 3 AS a, DATE '2024-03-05' - 3 AS b",
      // duck: INTERVAL 1 day 03:00:00
      "SELECT TIMESTAMP '2024-01-02 03:00:00' - TIMESTAMP '2024-01-01 00:00:00' AS a",
      // duck: TIMESTAMP 2024-02-29 00:00:00 (we keep DATE — value-equal,
      // rendering divergence documented in COVERAGE.md omissions)
      "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH AS a",
      // duck: map subscript and element_at both return a LIST (['b'], [])
      // — we return the VALUE / NULL (documented map[k] omission row)
      "SELECT element_at(map([1,2],['a','b']), 2) AS a",
      // duck: insertion order preserved ([2,1], ['b','a'])
      "SELECT map_keys(map([2,1],['b','a'])) AS k, map_values(map([2,1],['b','a'])) AS v",
      // duck: 2
      "SELECT cardinality(map([1,2],['a','b'])) AS c",
      // duck: true; true, true (lexicographic with prefix rule)
      "SELECT {'a': 1, 'b': 'x'} = {'a': 1, 'b': 'x'} AS eq",
      "SELECT [1,2] < [1,3] AS a, [1,2] < [1,2,0] AS b",
      // duck: false, false (binary codepoint collation)
      "SELECT 'a' < 'B' AS x, 'é' < 'f' AS y",
      // duck: NULL, 7, 3
      "SELECT nullif(5, 5) AS a, ifnull(NULL, 7) AS b, coalesce(NULL, NULL, 3) AS c")
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
    println(s"probe16 done: ${cases.size - fails}/${cases.size} ok")
  }
}
