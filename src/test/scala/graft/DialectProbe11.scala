package graft

import graft.server.Dialect

/** Round-11 probe tier: the trim-family argument order (the silent
  * divergence this tier caught — Spark's two-arg ltrim/rtrim/trim
  * take (trimStr, string), DuckDB's take (string, characters)),
  * negative-length left/right, and a sweep of still-unpinned string /
  * math / temporal spellings surfaced by a fresh DuckDB pass.
  */
object DialectProbe11 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation")
    val cases = Seq(
      // trim family, both arities (argument-order dispatch)
      "SELECT ltrim('xxabcx','x') AS a, rtrim('xxabcx','x') AS b, trim('xxabcx','x') AS c",
      "SELECT ltrim('  a') AS a, rtrim('a  ') AS b, trim('  a  ') AS c",
      "SELECT trim('xyabyx', 'xy') AS a",
      // negative-length left/right
      "SELECT left('hello',2) AS a, right('hello',2) AS b, left('hello',-2) AS c, right('hello',-2) AS d",
      "SELECT left('hello',-7) AS a, right('hello',-7) AS b",
      // base renderings
      "SELECT bin(5) AS a, hex(255) AS b, to_base(255,16) AS c",
      // string long tail
      "SELECT strip_accents('âbçdé') AS a, damerau_levenshtein('abc','acb') AS b",
      "SELECT ascii('A') AS a, chr(66) AS b, repeat('ab',3) AS c",
      "SELECT format_bytes(1234567) AS a",
      // math/list long tail
      "SELECT gcd(12,18) AS a, lcm(4,6) AS b",
      "SELECT list_grade_up([3,1,2]) AS a",
      // temporal
      "SELECT last_day(DATE '2024-02-10') AS a, bit_count(CAST(7 AS BIGINT)) AS b")
    var fails = 0
    cases.foreach { sql =>
      try {
        spark.sql(Dialect.rewrite(spark, sql)).collect()
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(110)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(140)}")
      }
    }
    println(s"probe11 done: ${cases.size - fails}/${cases.size} ok")
  }
}
