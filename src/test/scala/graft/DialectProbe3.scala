package graft

import graft.server.Dialect

/** Round-5 second-pass probe: next tier of DuckDB spellings. */
object DialectProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation", "region", "orders", "lineitem")
    val cases = Seq(
      // aggregates / ordered-set
      "SELECT quantile_cont(o_totalprice, 0.5) AS m FROM orders",
      "SELECT quantile_disc(o_totalprice, 0.5) AS m FROM orders",
      "SELECT quantile(o_totalprice, 0.5) AS m FROM orders",
      "SELECT arg_min(n_name, n_nationkey) AS a FROM nation",
      "SELECT arg_max(n_name, n_nationkey) AS a FROM nation",
      "SELECT min_by(n_name, n_nationkey) AS a FROM nation",
      "SELECT first(n_name ORDER BY n_nationkey) AS f FROM nation",
      "SELECT last(n_name ORDER BY n_nationkey) AS l FROM nation",
      "SELECT product(n_nationkey + 1) AS p FROM nation WHERE n_nationkey < 5",
      "SELECT favg(o_totalprice) AS m FROM orders",
      "SELECT fsum(o_totalprice) AS m FROM orders",
      "SELECT bit_xor(n_nationkey) AS x FROM nation",
      "SELECT entropy(n_regionkey) AS e FROM nation",
      "SELECT mad(o_totalprice) AS m FROM orders",
      "SELECT median(o_totalprice) AS m FROM orders",
      // scalar string
      "SELECT format('{} + {}', 1, 2) AS s",
      "SELECT printf('%d-%s', 7, 'x') AS s",
      "SELECT md5_number_lower('abc') AS h",
      "SELECT to_base(255, 16) AS s",
      "SELECT bar(5, 0, 10, 10) AS s",
      "SELECT repeat('ab', 3) AS s",
      "SELECT reverse('abc') AS s",
      "SELECT translate('abc', 'ab', 'xy') AS s",
      "SELECT replace('aaa', 'a', 'b') AS s",
      "SELECT ltrim('xxay', 'x') AS s",
      "SELECT string_to_array('a,b', ',') AS l",
      "SELECT split_part('a,b,c', ',', 2) AS s",
      "SELECT ascii('A') AS n, chr(66) AS c",
      "SELECT unicode('€') AS n",
      "SELECT to_hex(255) AS s, from_hex('ff') AS b",
      "SELECT bin(5) AS s",
      "SELECT hamming('abc', 'abd') AS d",
      "SELECT jaro_similarity('abc', 'abd') AS d",
      "SELECT jaro_winkler_similarity('abc', 'abd') AS d",
      "SELECT damerau_levenshtein('abc', 'acb') AS d",
      "SELECT editdist3('kitten', 'sitting') AS d",
      "SELECT nfc_normalize('é') AS s",
      "SELECT strip_accents('éà') AS s",
      // math
      "SELECT gamma(5) AS g, lgamma(5) AS lg",
      "SELECT even(2.5) AS e",
      "SELECT signbit(-1.0) AS b",
      "SELECT cot(1.0) AS c",
      "SELECT atan2(1.0, 2.0) AS a",
      "SELECT xor(5, 3) AS x",
      "SELECT divide(7, 2) AS d",
      "SELECT fdiv(7.0, 2.0) AS d, fmod(7.0, 2.0) AS m",
      "SELECT multiply(3, 4) AS m, subtract(9, 4) AS s, add(1, 2) AS a",
      "SELECT pow(2, 10) AS p, power(2, 10) AS p2",
      "SELECT log2(8.0) AS l, log10(100.0) AS m, ln(2.718) AS n",
      "SELECT log(100.0) AS l",            // DuckDB log(x) = log10!
      "SELECT log(2.0, 8.0) AS l",         // log(b, x)
      "SELECT cbrt(27.0) AS c",
      "SELECT factorial(5) AS f",
      "SELECT isnan('nan'::DOUBLE) AS b, isinf('inf'::DOUBLE) AS i, isfinite(1.0) AS f",
      "SELECT nextafter(1.0, 2.0) AS n",
      // date/time
      "SELECT date_part('year', DATE '2024-03-05') AS y",
      "SELECT datepart('month', DATE '2024-03-05') AS m",
      "SELECT dayname(DATE '2024-03-05') AS d, monthname(DATE '2024-03-05') AS m",
      "SELECT last_day(DATE '2024-02-05') AS d",
      "SELECT make_date(2024, 3, 5) AS d",
      "SELECT make_timestamp(2024, 3, 5, 10, 30, 0.0) AS t",
      "SELECT timezone('UTC', TIMESTAMP '2024-03-05 10:00:00') AS t",
      "SELECT week(DATE '2024-03-05') AS w, weekofyear(DATE '2024-03-05') AS wy",
      "SELECT dayofweek(DATE '2024-03-05') AS d, isodow(DATE '2024-03-05') AS i",
      "SELECT yearweek(DATE '2024-03-05') AS yw",
      "SELECT julian(DATE '2024-03-05') AS j",
      "SELECT age(TIMESTAMP '2024-03-05 00:00:00', TIMESTAMP '2020-01-01 00:00:00') AS a",
      "SELECT current_date AS d",
      "SELECT today() AS d",
      "SELECT get_current_timestamp() AS t",
      // struct/map
      "SELECT struct_extract({'a': 1}, 'a') AS v",
      "SELECT struct_insert({'a': 1}, b := 2) AS s",
      "SELECT map_keys(MAP {'k': 1}) AS k",
      "SELECT map_values(MAP {'k': 1}) AS v",
      "SELECT map_entries(MAP {'k': 1}) AS e",
      "SELECT cardinality(MAP {'k': 1}) AS n",
      "SELECT map_from_entries([{'k': 'a', 'v': 1}]) AS m",
      "SELECT element_at(MAP {'k': 5}, 'k') AS v",
      // misc
      "SELECT coalesce(NULL, 2) AS c, ifnull(NULL, 3) AS i, nvl(NULL, 4) AS n",
      "SELECT nullif(1, 1) AS n",
      "SELECT if(1 < 2, 'y', 'n') AS s",
      "SELECT typeof(1) AS t",
      "SELECT hash('abc') AS h",
      "SELECT range(3) AS r",
      "SELECT generate_series(1, 3) AS g",
      "SELECT gen_random_uuid() IS NOT NULL AS b",
      "SELECT uuid() IS NOT NULL AS b",
      "SELECT txid_current() AS t",
      "SELECT version() AS v",
      "SELECT greatest(1, 2, 3) AS g, least(1, 2, 3) AS l",
      "SELECT bitstring('0101', 8) AS b",
      "SELECT current_schema() AS s",
      "SELECT concat_ws('-', 'a', 'b') AS s",
      "SELECT constant_or_null(5, NULL) AS c",
      "SELECT count_if(n_nationkey > 10) AS c FROM nation"
    )
    var fails = 0
    cases.foreach { sql =>
      try {
        val rewritten = Dialect.rewrite(spark, sql)
        spark.sql(rewritten).collect()
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: $sql\n  -> ${e.getMessage.takeWhile(_ != '\n').take(140)}")
      }
    }
    println(s"probe3 done: ${cases.size - fails}/${cases.size} ok")
  }
}
