package graft

import graft.server.Dialect

/** Round-8 probe: the tier of DuckDB spellings after probe5 — epoch
  * conversions, date arithmetic sugar, list slicing/search, printf and
  * format, numeric long-tail (gcd/factorial/@abs), top-n aggregate
  * forms, and the remaining string predicates a migrating user types.
  */
object DialectProbe6 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation", "region", "orders")
    val cases = Seq(
      // epoch family
      "SELECT epoch(TIMESTAMP '2024-03-05 10:30:00') AS e",
      "SELECT epoch_ms(TIMESTAMP '2024-03-05 10:30:00') AS e",
      "SELECT epoch_us(TIMESTAMP '2024-03-05 10:30:00') AS e",
      "SELECT epoch_ms(1709634600000) AS t",
      "SELECT to_timestamp(1709634600) AS t",
      // date arithmetic sugar
      "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-05') AS n",
      "SELECT datediff('month', DATE '2024-01-01', DATE '2024-03-05') AS n",
      "SELECT date_add(DATE '2024-01-01', INTERVAL 5 DAY) AS d",
      "SELECT date_add(TIMESTAMP '2024-01-01 01:00:00', INTERVAL 90 MINUTE) AS t",
      "SELECT to_days(5) AS i, to_hours(3) AS h",
      "SELECT to_minutes(90) AS m, to_seconds(30) AS s",
      "SELECT DATE '2024-01-01' + 5 AS d",
      "SELECT strftime(TIMESTAMP '2024-03-05 10:30:00', '%Y-%m-%d') AS s",
      "SELECT strftime('%Y-%m-%d', TIMESTAMP '2024-03-05 10:30:00') AS s",
      "SELECT strptime('2024-03-05', '%Y-%m-%d') AS t",
      "SELECT generate_series(DATE '2024-01-01', DATE '2024-01-05', INTERVAL 1 DAY) AS g",
      // list slicing / search
      "SELECT list_slice([1, 2, 3, 4], 2, 3) AS s",
      "SELECT array_slice([1, 2, 3, 4], 2, 3) AS s",
      "SELECT list_position([10, 20, 30], 20) AS p",
      "SELECT list_indexof([10, 20, 30], 30) AS p",
      "SELECT list_contains([1, 2, 3], 2) AS c, array_has([1, 2], 9) AS h",
      "SELECT list_append([1, 2], 3) AS a, list_prepend(0, [1, 2]) AS p",
      "SELECT list_concat([1], [2, 3]) AS c",
      "SELECT [1, 2] || [3] AS c",
      "SELECT len([1, 2, 3]) AS n, array_length([1, 2]) AS m",
      "SELECT list_sort([3, 1, 2], 'DESC') AS s",
      "SELECT list_sort([3, 1, 2], 'ASC', 'NULLS LAST') AS s",
      "SELECT list_select([10, 20, 30], [3, 1]) AS s",
      "SELECT list_where([10, 20, 30], [true, false, true]) AS w",
      "SELECT list_resize([1, 2], 4, 0) AS r",
      // string predicates / formatting
      "SELECT starts_with('hello', 'he') AS s, ends_with('hello', 'lo') AS e",
      "SELECT prefix('hello', 'he') AS p, suffix('hello', 'lo') AS s",
      "SELECT contains('hello', 'ell') AS c",
      "SELECT position('b' IN 'abc') AS p",
      "SELECT strpos('abc', 'c') AS p, instr('abc', 'b') AS i",
      "SELECT format('{} + {} = {}', 1, 2, 3) AS f",
      "SELECT printf('%d/%s', 7, 'x') AS p",
      "SELECT ascii('A') AS a, chr(66) AS c",
      "SELECT reverse('abc') AS r, translate('abc', 'ac', 'xz') AS t",
      "SELECT split_part('a,b,c', ',', 2) AS p",
      "SELECT string_split_regex('a1b22c', '[0-9]+') AS l",
      "SELECT ltrim('xxhixx', 'x') AS l, rtrim('xxhixx', 'x') AS r",
      "SELECT ucase('a') AS u, lcase('A') AS l",
      "SELECT 'a' ILIKE 'A' AS i, 'abc' SIMILAR TO 'a.c' AS s",
      // numeric long-tail
      "SELECT gcd(12, 18) AS g, lcm(4, 6) AS l",
      "SELECT factorial(5) AS f",
      "SELECT 5! AS f",
      "SELECT @(-7) AS a",
      "SELECT cbrt(27.0) AS c",
      "SELECT log2(8.0) AS l2, log10(100.0) AS l10, ln(2.718281828) AS ln",
      "SELECT log(2, 8.0) AS lb",
      "SELECT trunc(-1.7) AS t, round(1234.5, -2) AS r",
      "SELECT atan2(1.0, 1.0) AS a, cot(1.0) AS c",
      "SELECT degrees(3.14159265) AS d, radians(180.0) AS r",
      "SELECT pi() AS p",
      // aggregate top-n / long-tail
      "SELECT min(n_name, 3) AS l FROM nation",
      "SELECT max(n_nationkey, 2) AS l FROM nation",
      "SELECT arg_min(n_name, n_nationkey, 2) AS l FROM nation",
      "SELECT arg_max(n_name, n_nationkey, 2) AS l FROM nation",
      "SELECT product(n_nationkey + 1) AS p FROM nation WHERE n_nationkey < 4",
      "SELECT fsum(o_totalprice) AS s FROM orders WHERE o_orderkey < 10",
      "SELECT favg(o_totalprice) AS a FROM orders WHERE o_orderkey < 10",
      "SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS q FROM orders",
      "SELECT quantile_disc(o_totalprice, 0.5) AS q FROM orders",
      "SELECT approx_top_k(n_regionkey, 2) AS t FROM nation"
    )
    var fails = 0
    cases.foreach { sql =>
      try {
        spark.sql(Dialect.rewrite(spark, sql)).collect()
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(90)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(120)}")
      }
    }
    println(s"probe6 done: ${cases.size - fails}/${cases.size} ok")
  }
}
