package graft

import graft.server.Dialect

/** Round-9 probe tier: list set-algebra + vector sugar, two-arg log,
  * quantile lists, date-part sugar, string edge helpers, product /
  * count_if aggregates.
  */
object DialectProbe8 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation", "orders")
    val cases = Seq(
      // list set algebra
      "SELECT list_intersect([1, 2, 3], [2, 3, 4]) AS i",
      "SELECT list_has_any([1, 2], [2, 9]) AS a, list_has_all([1, 2, 3], [2, 3]) AS b",
      "SELECT list_position([10, 20, 30], 20) AS p",
      "SELECT list_contains([1, 2], 2) AS c",
      "SELECT list_unique([1, 1, 2]) AS u",
      "SELECT list_prepend(0, [1, 2]) AS p, list_append([1, 2], 3) AS a",
      "SELECT list_concat([1], [2, 3]) AS c",
      "SELECT flatten([[1, 2], [3]]) AS f",
      "SELECT list_reduce([1, 2, 3], (a, b) -> a + b) AS r",
      "SELECT list_reverse([1, 2, 3]) AS r",
      "SELECT list_grade_up([30, 10, 20]) AS g",
      "SELECT list_value(1, 2, 3) AS v",
      // vector sugar (the retrieval engine's own domain)
      "SELECT list_cosine_similarity([1.0, 0.0], [1.0, 0.0]) AS c",
      "SELECT list_inner_product([1.0, 2.0], [3.0, 4.0]) AS d",
      "SELECT list_distance([0.0, 0.0], [3.0, 4.0]) AS d",
      // list_cosine_distance is absent in DuckDB 1.5.2 itself — not probed
      // math edges
      "SELECT log(2, 8) AS l",
      "SELECT cbrt(27) AS c",
      "SELECT degrees(pi()) AS d, radians(180) AS r",
      "SELECT even(2.5) AS e, even(-2.5) AS f",
      "SELECT atan2(1, 1) AS a",
      "SELECT cot(1) AS c",
      "SELECT isnan('nan'::DOUBLE) AS a, isinf('inf'::DOUBLE) AS b, isfinite(1.0) AS c",
      "SELECT trunc(2.7) AS t, trunc(-2.7) AS u",
      // quantile lists
      "SELECT quantile_cont(x, [0.25, 0.5, 0.75]) AS q FROM (VALUES (1.0), (2.0), (3.0), (4.0)) t(x)",
      "SELECT quantile_disc(x, [0.5]) AS q FROM (VALUES (1), (2), (3)) t(x)",
      // date sugar
      "SELECT last_day(DATE '2024-02-10') AS d",
      "SELECT monthname(DATE '2024-02-10') AS m, dayname(DATE '2024-02-10') AS d",
      "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-02-01') AS d",
      "SELECT date_diff('month', TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-03-01 00:00:00') AS d",
      "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 10:22:00') AS b",
      "SELECT make_date(2024, 2, 29) AS d",
      "SELECT make_timestamp(2024, 2, 29, 10, 30, 0) AS t",
      "SELECT epoch(TIMESTAMP '1970-01-02 00:00:00') AS e",
      "SELECT epoch_ms(TIMESTAMP '1970-01-01 00:00:01') AS e",
      "SELECT dayofweek(DATE '2024-02-11') AS d, weekofyear(DATE '2024-02-11') AS w",
      // string edges
      "SELECT ascii('A') AS a, chr(66) AS c",
      "SELECT left('hello', 2) AS l, right('hello', 2) AS r",
      "SELECT translate('abc', 'ab', 'xy') AS t",
      "SELECT to_hex(255) AS h, from_hex('616263') AS f",
      "SELECT split_part('a,b,c', ',', 2) AS p",
      "SELECT strip_accents('café') AS s",
      "SELECT hamming('abc', 'abd') AS h",
      "SELECT unicode('€') AS u",
      "SELECT repeat('ab', 3) AS r, reverse('abc') AS v",
      "SELECT starts_with('hello', 'he') AS s, ends_with('hello', 'lo') AS e",
      "SELECT position('b' IN 'abc') AS p, strpos('abc', 'b') AS s, instr('abc', 'b') AS i",
      // aggregates
      "SELECT product(x) AS p FROM (VALUES (2.0), (3.0), (4.0)) t(x)",
      "SELECT count_if(x > 1) AS c FROM (VALUES (1), (2), (3)) t(x)",
      "SELECT bit_xor(x) AS b FROM (VALUES (1), (3)) t(x)",
      "SELECT bool_and(x > 0) AS a, bool_or(x > 2) AS o FROM (VALUES (1), (2)) t(x)")
    var fails = 0
    cases.foreach { sql =>
      try {
        spark.sql(Dialect.rewrite(spark, sql)).collect()
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(100)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(140)}")
      }
    }
    println(s"probe8 done: ${cases.size - fails}/${cases.size} ok")
  }
}
