package graft

import graft.server.Dialect

/** Round-10 probe tier: operator function-forms (add/divide/fdiv/
  * fmod/xor), path parsing helpers, date-part long tail (century/
  * isodow/julian/age), case/length aliases, struct surgery, SIMILAR
  * TO, and the statistics aggregate aliases.
  */
object DialectProbe9 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation", "orders")
    val cases = Seq(
      // operator function-forms
      "SELECT fdiv(7, 2) AS f, fmod(7, 2) AS m",
      "SELECT divide(7, 2) AS d, multiply(3, 4) AS m, add(1, 2) AS a, subtract(5, 3) AS s",
      "SELECT mod(7, 3) AS m",
      "SELECT xor(3, 5) AS x",
      "SELECT ceiling(2.1) AS c",
      "SELECT log2(8) AS l, log10(100) AS m",
      "SELECT sign(-3) AS s",
      "SELECT nextafter(1, 2) AS n",
      "SELECT greatest_common_divisor(12, 8) AS g, least_common_multiple(4, 6) AS l",
      // path helpers
      "SELECT parse_filename('/a/b/c.txt') AS f",
      "SELECT parse_filename('/a/b/c.txt', true) AS f",
      "SELECT parse_dirname('/a/b/c.txt') AS d",
      "SELECT parse_dirpath('/a/b/c.txt') AS p",
      "SELECT parse_path('/a/b/c.txt') AS l",
      // date-part long tail
      "SELECT century(DATE '2024-02-10') AS c, decade(DATE '2024-02-10') AS d",
      "SELECT quarter(DATE '2024-05-10') AS q, isodow(DATE '2024-02-11') AS i",
      "SELECT isoyear(DATE '2021-01-01') AS y",
      "SELECT julian(DATE '2000-01-01') AS j",
      "SELECT age(TIMESTAMP '2024-03-05 00:00:00', TIMESTAMP '2023-01-04 00:00:00') AS a",
      "SELECT dayofyear(DATE '2024-02-10') AS d, date_part('doy', DATE '2024-02-10') AS p",
      "SELECT datepart('year', DATE '2024-02-10') AS y",
      "SELECT date_trunc('quarter', DATE '2024-05-10') AS q",
      "SELECT make_time(10, 30, 12.5) AS t",
      "SELECT to_years(2) AS y, to_months(3) AS m, to_weeks(2) AS w",
      // case/length aliases and string edges
      "SELECT ucase('ab') AS u, lcase('AB') AS l",
      "SELECT lpad('7', 3, '0') AS l, rpad('7', 3, 'x') AS r",
      "SELECT substr('hello', -3) AS s",
      "SELECT ord('A') AS o",
      "SELECT bit_length('abc') AS b",
      "SELECT octet_length(encode('abc')) AS o",
      "SELECT to_base(5, 2, 8) AS b",
      "SELECT md5_number_upper('abc') IS NOT NULL AS u",
      // struct surgery
      "SELECT struct_extract({'a': 1, 'b': 2}, 'a') AS v",
      "SELECT struct_insert({'a': 1}, b := 2) AS s",
      "SELECT if(1 < 2, 'y', 'n') AS i",
      // list element forms
      "SELECT list_element([10, 20], 2) AS e, list_extract([10, 20], 1) AS x",
      "SELECT array_extract('abc', 2) AS c",
      "SELECT list_aggr([1, 2, 3], 'sum') AS s, array_aggregate([1, 2], 'max') AS m",
      // SIMILAR TO
      "SELECT 'ab' SIMILAR TO 'a.' AS s, 'abc' NOT SIMILAR TO 'z.*' AS n",
      // statistics aggregate aliases
      "SELECT variance(x) AS v, var_pop(x) AS p FROM (VALUES (1.0),(2.0),(3.0)) t(x)",
      "SELECT stddev(x) AS s, stddev_pop(x) AS p FROM (VALUES (1.0),(2.0),(3.0)) t(x)",
      "SELECT geomean(x) AS g FROM (VALUES (1.0),(4.0)) t(x)",
      "SELECT kahan_sum(x) AS k FROM (VALUES (1.5),(2.5)) t(x)")
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
    println(s"probe9 done: ${cases.size - fails}/${cases.size} ok")
  }
}
