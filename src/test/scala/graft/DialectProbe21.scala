package graft

import graft.server.Dialect

/** Round-12 probe tier 21: the ADVICE batch — DuckDB arithmetic
  * semantics must reach CTE bodies and subquery inner plans (the
  * parse-level transform previously stopped at innerChildren), plus
  * the literal-protection fixes (extract-in-literal, backslash
  * identifiers, e'\'' escapes, backref renumbering, exact integral
  * string casts). DuckDB ground truth pinned alongside (run
  * 2026-08-15). NOTE regexp backrefs: DuckDB's RE2 has NO
  * backreference support ('(a)\1' matches nothing there); ours keeps
  * Java semantics, so the pin asserts self-consistent NUMBERING
  * (first-match emulation must not shift user groups), a documented
  * extension rather than a DuckDB value match.
  */
object DialectProbe21 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: 2.5 DOUBLE (not DECIMAL 2.500000)
      "WITH q AS (SELECT 5.0/2 AS r) SELECT r FROM q",
      // duck: 2.5
      "SELECT (SELECT 10/4) AS x",
      // duck: NULL, NULL (never the ANSI divide-by-zero error)
      "WITH q AS (SELECT 1/0 AS r) SELECT r, 7%0 AS m FROM q",
      // duck: 6 BIGINT (not INTERVAL)
      "SELECT (SELECT DATE '2024-03-05' - DATE '2024-02-28') AS d",
      // duck: 4.5 — subquery nested inside a CTE body
      "WITH q AS (SELECT (SELECT 9/2) AS r) SELECT r FROM q",
      // java-consistent 'Xb' (renumbered \1 -> \2 under the prefix group)
      """SELECT regexp_replace('aab', '(a)\1', 'X') AS r""",
      // duck: exact BIGINT, half-away string rounding
      "SELECT CAST('9223372036854775807' AS BIGINT) AS b, CAST('12.5' AS INT) AS i, CAST('-12.5' AS INT) AS j",
      // duck: the literal survives (no graft_extract_epoch rewrite inside quotes)
      "SELECT 'extract(epoch FROM x)' AS s",
      // duck: it's (backslash-quote escape inside e'...')
      """SELECT e'it\'s' AS s""",
      // duck: backslash-d plus (standard literal, no escape processing)
      "SELECT '\\d+' AS s")
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
    println(s"probe21 done: ${cases.size - fails}/${cases.size} ok")
  }
}
