package graft

import graft.server.Dialect

/** Round-12 probe tier 25: the regex long tail — flags ('i','g','s',
  * and DuckDB's newline-sensitivity options), the named-group struct
  * form, group-index extract_all, full-match, escape,
  * split-to-table/array, backreference replacement, missing/optional
  * group semantics. DuckDB ground truth run 2026-08-15 (values in
  * comments).
  *
  * The sweep found THREE real divergences, all closed + pinned in
  * DialectSpec probe-25:
  *   1. RE2 rewrite backrefs: '\1' in a Java replacement is the
  *      literal digit '1' — every DuckDB group reference was silently
  *      dropped. Replacements now translate \N -> $N (shifted +1
  *      under the first-match emulation, which also gains backref
  *      support instead of the loud guard), \0 = whole match,
  *      \\ collapse, literal $ escaped.
  *   2. DuckDB options apply IN ORDER and cancel: 'ic' is
  *      case-SENSITIVE; 'm'/'n'/'p' mean newline-sensitive (Java's
  *      default), not multiline — the old (?m) mapping silently
  *      diverged and (?p) raised at run time.
  *   3. regexp_split_to_table was unregistered — now explode(split).
  */
object DialectProbe25 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: false, true, false
      "SELECT regexp_matches('aBc', 'abc') AS a, regexp_matches('aBc', 'abc', 'i') AS b, regexp_matches('abc', '^b') AS c",
      // duck: {'y': 2024, 'm': 01} struct
      """SELECT regexp_extract('2024-01-15', '(\d+)-(\d+)', ['y','m']) AS s""",
      // duck: ['1','22','333'], ['1','22']
      """SELECT regexp_extract_all('a1b22c333', '\d+') AS a, regexp_extract_all('a1b22', '([a-z])(\d+)', 2) AS b""",
      // duck: 'XXX', 'XBX'
      "SELECT regexp_replace('aaa', 'a', 'X', 'g') AS a, regexp_replace('aBa', 'a', 'X', 'gi') AS b",
      // duck: rows a, b, c
      "SELECT regexp_split_to_table('a,b;c', '[,;]') AS p",
      // duck: true, false
      "SELECT regexp_full_match('abc', 'a.c') AS a, regexp_full_match('abc', 'a.') AS b",
      // duck: 'a\.b\*c'
      "SELECT regexp_escape('a.b*c') AS e",
      // duck: true, true
      "SELECT 'abc' ~ 'a.c' AS a, 'abc' !~ 'z' AS b",
      // duck: false (dot stops at newline), true with 's', false with
      // 'm' (DuckDB's 'm' is NOT multiline — inert), true inline (?m)
      "SELECT regexp_matches('a' || chr(10) || 'b', 'a.b') AS a, regexp_matches('a' || chr(10) || 'b', 'a.b', 's') AS b, regexp_matches('a' || chr(10) || 'b', '^b', 'm') AS c, regexp_matches('a' || chr(10) || 'b', '(?m)^b') AS d",
      // duck: 'world hello' (backref swap), 'aXc' (first only), '[b][b]'
      """SELECT regexp_replace('hello world', '(\w+) (\w+)', '\2 \1') AS sw, regexp_replace('abc', 'b', 'X') AS fo, regexp_replace('abab', 'a(b)', '[\1]', 'g') AS grp""",
      // duck: 'abc123', '123'; missing/optional groups -> '' not NULL
      """SELECT regexp_extract('abc123', '([a-z]+)(\d+)', 0) AS g0, regexp_extract('abc123', '([a-z]+)(\d+)', 2) AS g2, regexp_extract('abc', 'z', 1) AS miss, regexp_extract('abc', '(a)(z)?', 2) AS optg""",
      // duck: ['a','b','c'] twice; \p{L} unicode class true
      """SELECT regexp_split_to_array('axbXc', '[xX]') AS arr, string_split_regex('a1b22c', '\d+') AS ssr, regexp_matches('x', '\p{L}') AS pl""")
    cases.foreach { sql =>
      try {
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(130)}\n  -> ${rows.mkString("; ").take(220)}")
      } catch {
        case e: Throwable =>
          println(s"ERR : ${sql.take(130)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(170)}")
      }
    }
  }
}
