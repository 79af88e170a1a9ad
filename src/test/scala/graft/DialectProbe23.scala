package graft

import graft.server.Dialect

/** Round-12 probe tier 23: bit operators, string/list bracket slicing,
  * substr/left/right edge semantics, formatting (printf/format/hex/
  * to_base/format_bytes), position family. DuckDB ground truth run
  * 2026-08-15 (values in comments).
  *
  * The sweep found ONE real divergence: fmt fill/align specs — and
  * worse, the old one-printf translation right-aligned `{:5}` on
  * strings where fmt (and DuckDB) left-align them, a silent wrong
  * value. format() now builds per-placeholder printf/pad expressions
  * (default align by argument type, `<`/`>` printf flags, `^`/custom
  * fill via guarded pads, no truncation) and format/printf both
  * propagate NULL arguments to a NULL result like DuckDB instead of
  * rendering the string "null". DialectSpec probe-23 block pins it
  * all; everything else in this sweep already matched.
  */
object DialectProbe23 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: 1, 7, 6, -6, 20, 5 (all INTEGER)
      "SELECT 5 & 3 AS a, 5 | 3 AS b, xor(5,3) AS c, ~5 AS d, 5 << 2 AS e, 20 >> 2 AS f",
      // duck: 8, 64, 0
      "SELECT bit_count(255) AS a, bit_count(CAST(-1 AS BIGINT)) AS b, bit_count(0) AS c",
      // duck: 'bcd','def','abc','c','f' (1-based inclusive slices)
      "SELECT 'abcdef'[2:4] AS a, 'abcdef'[-3:] AS b, 'abcdef'[:3] AS c, 'abcdef'[3] AS d, 'abcdef'[-1] AS e",
      // duck: [2,3], 4, [1,2]
      "SELECT ([1,2,3,4])[2:3] AS a, ([1,2,3,4])[-1] AS b, ([1,2,3,4])[:2] AS c",
      // duck: 'ab','ef','ef',''
      "SELECT substr('abcdef', 0, 3) AS a, substr('abcdef', -2, 3) AS b, substr('abcdef', -2) AS c, substr('abcdef', 2, 0) AS d",
      // duck: 'abcd','cdef','ab','ef'  (negative n = drop |n| from the other end)
      "SELECT left('abcdef', -2) AS a, right('abcdef', -2) AS b, left('abcdef', 2) AS c, right('abcdef', 2) AS d",
      // duck: '', '', 'ababab'
      "SELECT repeat('ab', -1) AS a, repeat('ab', 0) AS b, repeat('ab', 3) AS c",
      // duck: '5-x-3.14', '5-x', '3.14', '   ab'
      "SELECT printf('%d-%s-%.2f', 5, 'x', 3.14159) AS a, format('{}-{}', 5, 'x') AS b, format('{:.2f}', 3.14159) AS c, format('{:>5}', 'ab') AS d",
      // duck: 'FF','6162',blob'ab','101','FF','1.0 MiB'
      "SELECT hex(255) AS a, hex('ab') AS b, unhex('6162') AS c, bin(5) AS d, to_base(255, 16) AS e, format_bytes(1048576) AS f",
      // duck: 3, 1, NULL (NULLs skipped unless all-NULL)
      "SELECT greatest(1, NULL, 3) AS a, least(1, NULL, 3) AS b",
      // duck: 97, 8364, 8364
      "SELECT ascii('abc') AS a, unicode('€') AS b, ord('€') AS c",
      // duck: 2,2,2,true,true,true,true
      "SELECT instr('abcabc','bc') AS a, strpos('abcabc','bc') AS b, position('bc' IN 'abcabc') AS c, contains('abc','b') AS d, starts_with('abc','ab') AS e, suffix('abc','bc') AS f, ends_with('abc','bc') AS g",
      // duck: 'bcd', [2,3]
      "SELECT array_slice('abcdef', 2, 4) AS a, array_slice([1,2,3,4], 2, 3) AS b")
    var fails = 0
    cases.foreach { sql =>
      try {
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(120)}\n  -> ${rows.mkString("; ").take(240)}")
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(120)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(200)}")
      }
    }
    println(s"probe23 done: fails=$fails")
  }
}
