package graft

import graft.server.Dialect

/** Round-11e probe tier 15: arithmetic edge semantics (division/modulo
  * by zero, negative `//` and `%` signs), greatest/least NULL-skip,
  * position-family arg orders and not-found, split_part edge indices,
  * list sort NULL placement, descending series, pad/repeat negatives,
  * printf/fmt-format, bit operators, Unicode case mapping (ß),
  * week/yearweek, to_base/unicode, age/last_day/make_timestamp.
  * DuckDB ground truth pinned alongside each case (same queries run in
  * DuckDB 2026-08-15; see probe notes in COVERAGE.md).
  */
object DialectProbe15 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: NULL DOUBLE, NULL DOUBLE, NULL DOUBLE
      "SELECT 1/0 AS a, -1/0 AS b, 0/0 AS c",
      // duck: NULL INT / NULL INT
      "SELECT 1//0 AS a, 1%0 AS b",
      // duck: -1, 1 (trunc-sign modulo) ; -3, -3 (trunc-toward-zero //)
      "SELECT -7 % 3 AS a, 7 % -3 AS b, -7 // 2 AS c, 7 // -2 AS d",
      // duck: 3, 1, NULL (NULL-skipping)
      "SELECT greatest(1, NULL, 3) AS g, least(1, NULL, 3) AS l, greatest(CAST(NULL AS INT), NULL) AS gn",
      // duck: 3, 0, 3, 3
      "SELECT strpos('hello', 'll') AS a, strpos('hello', 'zz') AS b, position('ll' IN 'hello') AS c, instr('hello','ll') AS d",
      // duck: 'b', 'c', '', ''   (0 and out-of-range -> empty, NOT error)
      "SELECT split_part('a,b,c', ',', 2) AS a, split_part('a,b,c', ',', -1) AS b, split_part('a,b,c', ',', 9) AS c, split_part('a,b,c', ',', 0) AS d",
      // duck: [1,3,NULL], [3,1,NULL], [NULL,3,1]
      "SELECT list_sort([3, NULL, 1]) AS a, list_reverse_sort([3, NULL, 1]) AS b, list_sort([3, NULL, 1], 'DESC', 'NULLS FIRST') AS c",
      // duck: 3 (count of distinct non-NULL), [1,2] (dups+NULLs dropped)
      "SELECT list_unique([1,2,2,NULL,NULL,3]) AS a, list_sort(list_distinct([2,1,2,NULL])) AS b",
      // duck: [5,3], [5,3,1], [], [1]
      "SELECT range(5, 1, -2) AS a, generate_series(5, 1, -2) AS b, range(1, 1) AS c, generate_series(1,1) AS d",
      // duck: '' , '' , error('Insufficient padding'), '', 'abab'
      "SELECT lpad('ab', -1, 'x') AS a, rpad('ab', 0, 'x') AS b",
      "SELECT lpad('ab', 5, '') AS a",
      "SELECT repeat('ab', -2) AS a, repeat('ab', 2) AS b",
      // duck: '7-x-1.50', '1-b', '3.14'
      "SELECT printf('%d-%s-%.2f', 7, 'x', 1.5) AS a",
      "SELECT format('{}-{}', 1, 'b') AS b, format('{:.2f}', 3.14159) AS c",
      // duck: 8, 64, 1, 7, 6, -6
      "SELECT 1 << 3 AS a, 256 >> 2 AS b, 5 & 3 AS c, 5 | 3 AS d, xor(5, 3) AS e, ~5 AS f",
      // duck: 775 days 21:30:00 INTERVAL; 2024-02-29; 2024-02-29; 2024-02-29 01:02:03.5
      "SELECT age(TIMESTAMP '2024-03-15 10:00:00', TIMESTAMP '2022-01-20 12:30:00') AS a",
      "SELECT last_day(DATE '2024-02-05') AS a, make_date(2024, 2, 29) AS b, make_timestamp(2024,2,29,1,2,3.5) AS c",
      // duck: 1, 1, 202401
      "SELECT week(DATE '2024-01-01') AS a, weekofyear(DATE '2024-01-01') AS b, yearweek(DATE '2024-01-01') AS c",
      // duck: 'FF', '101', 'FF'
      "SELECT to_base(255, 16) AS a, bin(5) AS b, hex(255) AS c",
      // duck: 65, 233, 'é'
      "SELECT ascii('Abc') AS a, unicode('é') AS b, chr(233) AS c",
      // duck: 'hé', 'olléh', 'STRAẞE' (utf8proc simple mapping: ß -> U+1E9E)
      "SELECT left('héllo', 2) AS a, reverse('héllo') AS b, upper('straße') AS c")
    var fails = 0
    cases.foreach { sql =>
      try {
        // execute exactly as the serving plane does (QueryServer runQuery)
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(110)}\n  -> ${rows.mkString("; ").take(200)}")
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(110)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(160)}")
      }
    }
    println(s"probe15 done: ${cases.size - fails}/${cases.size} ok")
  }
}
