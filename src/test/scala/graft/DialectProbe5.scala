package graft

import graft.server.Dialect

/** Round-6 probe: the next tier of DuckDB spellings after probe3/4
  * reached 95/95 and 30/30 — list/map/struct function families, JSON
  * construction, regex extraction, string aggregation variants, and
  * date-part sugar a migrating user reaches for next.
  */
object DialectProbe5 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation", "region", "orders")
    val cases = Seq(
      // list family, next tier
      "SELECT list_reduce([1, 2, 3], (a, b) -> a + b) AS r",
      "SELECT list_unique([1, 2, 2, NULL]) AS u",
      "SELECT list_reverse([1, 2, 3]) AS r",
      "SELECT list_zip([1, 2], ['a', 'b']) AS z",
      "SELECT flatten([[1, 2], [3]]) AS f",
      "SELECT list_any_value([NULL, 2, 3]) AS a",
      "SELECT list_count([1, NULL, 3]) AS c",
      "SELECT list_has_any([1, 2], [2, 9]) AS a, list_has_all([1, 2, 3], [1, 2]) AS b",
      "SELECT array_cosine_similarity([1.0, 0.0], [1.0, 0.0]) AS s",
      "SELECT array_inner_product([1.0, 2.0], [3.0, 4.0]) AS p",
      "SELECT array_distance([0.0, 0.0], [3.0, 4.0]) AS d",
      "SELECT list_grade_up([30, 10, 20]) AS g",
      "SELECT repeat([1, 2], 2) AS r",
      // map family
      "SELECT map_keys(MAP {'a': 1, 'b': 2}) AS k",
      "SELECT map_values(MAP {'a': 1}) AS v",
      "SELECT map_entries(MAP {'a': 1}) AS e",
      "SELECT cardinality(MAP {'a': 1, 'b': 2}) AS c",
      "SELECT map_contains(MAP {'a': 1}, 'a') AS c",
      "SELECT element_at(MAP {'a': 1}, 'a') AS v",
      "SELECT map_from_entries([{'k': 'a', 'v': 1}]) AS m",
      "SELECT map() AS m",
      // struct family
      "SELECT struct_pack(a := 1, b := 'x') AS s",
      "SELECT {'a': 1, 'b': 2}.a AS v",
      "SELECT row(1, 'x').col1 AS v",
      // JSON construction / serialization
      "SELECT to_json({'a': 1}) AS j",
      "SELECT json_object('a', 1, 'b', 'x') AS j",
      "SELECT json_array(1, 2, 3) AS j",
      "SELECT json_extract_string('{\"a\": \"x\"}', '$.a') AS v",
      "SELECT json_valid('{\"a\": 1}') AS v",
      "SELECT json_array_length('[1,2,3]') AS n",
      "SELECT json_keys('{\"a\": 1, \"b\": 2}') AS k",
      "SELECT json_structure('{\"a\": 1}') AS s",
      // regex next tier
      "SELECT regexp_extract('abc123', '([a-z]+)([0-9]+)', 2) AS g",
      "SELECT regexp_extract_all('a1b2', '[0-9]') AS l",
      "SELECT regexp_full_match('abc', '[a-z]+') AS m",
      "SELECT regexp_escape('a.b') AS e",
      // string aggregation variants / misc string
      "SELECT string_agg(n_name, '|' ORDER BY n_name) AS s FROM nation WHERE n_nationkey < 3",
      "SELECT listagg(n_name, ',') AS s FROM nation WHERE n_nationkey < 3",
      "SELECT group_concat(n_name, ',') AS s FROM nation WHERE n_nationkey < 3",
      "SELECT md5('abc') AS h, sha256('abc') AS s",
      "SELECT sha1('abc') AS s",
      "SELECT left('hello', 2) AS l, right('hello', 2) AS r",
      "SELECT lpad('7', 3, '0') AS l, rpad('7', 3, '0') AS r",
      "SELECT substring_grapheme('héllo', 2, 3) AS s",
      "SELECT string_agg(DISTINCT n_regionkey, ',') AS s FROM nation",
      // date/time sugar
      "SELECT date_part(['year', 'month'], DATE '2024-03-05') AS p",
      "SELECT last_day(DATE '2024-02-05') AS d",
      "SELECT monthname(DATE '2024-03-05') AS m, dayname(DATE '2024-03-05') AS d",
      "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-03-05 10:37:00') AS b",
      "SELECT make_date(2024, 3, 5) AS d, make_timestamp(2024, 3, 5, 10, 30, 0) AS t",
      "SELECT datetrunc('month', DATE '2024-03-15') AS d",
      "SELECT datesub('day', DATE '2024-01-01', DATE '2024-03-05') AS n",
      "SELECT current_setting('threads') AS t",
      // window sugar
      "SELECT n_name, ntile(2) OVER (ORDER BY n_nationkey) AS b FROM nation WHERE n_nationkey < 4",
      "SELECT n_name, cume_dist() OVER (ORDER BY n_nationkey) AS c FROM nation WHERE n_nationkey < 4",
      // aggregates next tier
      "SELECT count_if(n_nationkey > 5) AS c FROM nation",
      "SELECT bool_and(n_nationkey >= 0) AS a, bool_or(n_nationkey > 100) AS o FROM nation",
      "SELECT variance(o_totalprice) AS v, var_pop(o_totalprice) AS p FROM orders",
      "SELECT skewness(o_totalprice) AS s, kurtosis(o_totalprice) AS k FROM orders",
      "SELECT geomean(o_totalprice) AS g FROM orders WHERE o_totalprice > 0",
      "SELECT bitstring_agg(n_nationkey) AS b FROM nation WHERE n_nationkey < 5"
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
    println(s"probe5 done: ${cases.size - fails}/${cases.size} ok")
  }
}
