package graft

import graft.server.Dialect

/** Round-11 probe tier 19: string-utility long tail — regex extract
  * group/all/split spellings, SIMILAR TO's regex (not LIKE) semantics,
  * path parsing, human-readable byte formats, base64/hex codecs,
  * array/string converters, edit-distance family, NFC normalization,
  * ord. DuckDB ground truth pinned alongside (run 2026-08-15).
  */
object DialectProbe19 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: '01'
      """SELECT regexp_extract('2024-01-02', '(\d+)-(\d+)', 2) AS g""",
      // duck: ['1','22']
      """SELECT regexp_extract_all('a1b22c', '\d+') AS a""",
      // duck: ['a','b','c'] both spellings
      """SELECT regexp_split_to_array('a1b22c', '\d+') AS a, str_split_regex('a1b22c', '\d+') AS b""",
      // duck: false (SIMILAR TO is REGEX full-match — % is literal), true
      "SELECT 'abc' SIMILAR TO 'a%' AS s, 'abc' SIMILAR TO 'a.*' AS r",
      // duck: '/', '/a/b', 'c.txt', ['/','a','b','c.txt']
      "SELECT parse_dirname('/a/b/c.txt') AS d, parse_dirpath('/a/b/c.txt') AS p, parse_filename('/a/b/c.txt') AS f, parse_path('/a/b/c.txt') AS pp",
      // duck: '1.1 MiB', '1.2 MB'
      "SELECT format_bytes(1234567) AS f, formatReadableDecimalSize(1234567) AS g",
      // duck: 'YWI=', blob 'ab'
      "SELECT to_base64(CAST('ab' AS BLOB)) AS b, from_base64('YWI=') AS f",
      // duck: ['a','b'], '1-2'
      "SELECT string_to_array('a,b', ',') AS a, array_to_string([1,2], '-') AS s",
      // duck: 1, 1, 1
      "SELECT damerau_levenshtein('abc','acb') AS d, hamming('abc','abd') AS h, mismatches('abc','abd') AS m",
      // duck: 'é' (composed), 'ea'
      "SELECT nfc_normalize('e' || chr(769)) AS n, strip_accents('éà') AS s",
      // duck: 233, 'FF', blob FF
      "SELECT ord('é') AS o, to_hex(255) AS h, from_hex('FF') AS f")
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
    println(s"probe19 done: ${cases.size - fails}/${cases.size} ok")
  }
}
