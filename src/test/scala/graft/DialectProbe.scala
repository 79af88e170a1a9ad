package graft

import graft.server.Dialect

/** Dev probe (test scope, not shipped): runs a battery of common DuckDB
  * spellings through the dialect shim + spark.sql and prints which ones
  * fail — the empirical gap list for the long-tail work.
  *
  * Run: sbt 'Test/runMain graft.DialectProbe'
  */
object DialectProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark) // what every serving session gets
    T.views(spark, TestSpark.sf, "nation", "region")
    val cases = Seq(
      // slicing / indexing
      "SELECT 'abcdef'[2:4] AS s",
      "SELECT [1,2,3][2] AS x",
      "SELECT [1,2,3][-1] AS x",
      "SELECT [10,20,30][1:2] AS xs",
      // list functions
      "SELECT list_sort([3,1,2]) AS l",
      "SELECT list_reverse_sort([1,3,2]) AS l",
      "SELECT list_distinct([1,1,2]) AS l",
      "SELECT list_unique([1,1,2]) AS n",
      "SELECT list_contains([1,2], 2) AS b",
      "SELECT list_position([7,8,9], 8) AS i",
      "SELECT list_append([1,2], 3) AS l",
      "SELECT list_prepend(0, [1,2]) AS l",
      "SELECT list_concat([1],[2]) AS l",
      "SELECT [1] || [2] AS l",
      "SELECT flatten([[1],[2,3]]) AS l",
      "SELECT list_filter([1,2,3], x -> x > 1) AS l",
      "SELECT list_transform([1,2], x -> x * 2) AS l",
      "SELECT list_slice([1,2,3,4], 2, 3) AS l",
      "SELECT array_length([1,2,3]) AS n",
      // strings
      "SELECT 'a' ILIKE 'A' AS b",
      "SELECT strpos('hello', 'll') AS i",
      "SELECT position('ll' IN 'hello') AS i",
      "SELECT left('hello', 2) AS s, right('hello', 2) AS t",
      "SELECT starts_with('abc', 'ab') AS b",
      "SELECT ends_with('abc', 'bc') AS b",
      "SELECT suffix('abc', 'bc') AS b",
      "SELECT prefix('abc', 'ab') AS b",
      "SELECT printf('%d-%s', 7, 'x') AS s",
      "SELECT format('{}-{}', 7, 'x') AS s",
      "SELECT repeat('ab', 3) AS s",
      "SELECT reverse('abc') AS s",
      "SELECT md5('a') AS h",
      "SELECT regexp_matches('abc', 'b') AS b",
      "SELECT regexp_extract('a1b2', '([0-9])([a-z])', 2) AS s",
      "SELECT regexp_extract_all('a1b2', '[0-9]') AS l",
      "SELECT regexp_split_to_array('a,b', ',') AS l",
      "SELECT string_to_array('a,b', ',') AS l",
      "SELECT concat_ws('-', 'a', 'b') AS s",
      "SELECT instr('hello', 'l') AS i",
      "SELECT char(65) AS s",
      "SELECT ascii('A') AS i",
      // dates / times
      "SELECT DATE '2024-03-05' + INTERVAL 1 DAY AS d",
      "SELECT DATE '2024-03-05' - INTERVAL '1' MONTH AS d",
      "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-01-08') AS n",
      "SELECT datediff('day', DATE '2024-01-01', DATE '2024-01-08') AS n",
      "SELECT date_part('year', DATE '2024-03-05') AS y",
      "SELECT datepart('month', DATE '2024-03-05') AS m",
      "SELECT date_trunc('month', DATE '2024-03-15') AS d",
      "SELECT last_day(DATE '2024-02-05') AS d",
      "SELECT dayname(DATE '2024-03-05') AS s",
      "SELECT monthname(DATE '2024-03-05') AS s",
      "SELECT day(DATE '2024-03-05') AS d, month(DATE '2024-03-05') AS m, year(DATE '2024-03-05') AS y",
      "SELECT today() AS d",
      "SELECT get_current_timestamp() IS NOT NULL AS b",
      "SELECT time_bucket(INTERVAL '1' HOUR, TIMESTAMP '2024-03-05 10:42:00') AS t",
      "SELECT make_date(2024, 3, 5) AS d",
      "SELECT make_timestamp(2024, 3, 5, 10, 0, 0) AS t",
      // structs / maps / json
      "SELECT struct_pack(a := 1, b := 'x') AS s",
      "SELECT {'a': 1, 'b': 2} AS s",
      "SELECT MAP {'k': 1} AS m",
      "SELECT map_from_entries([(1, 'a'), (2, 'b')]) AS m",
      "SELECT '{\"a\": {\"b\": 2}}'::JSON -> 'a' AS j",
      "SELECT '{\"a\": 1}' ->> 'a' AS v",
      "SELECT json_extract('{\"a\": 1}', '$.a') AS v",
      "SELECT json_extract_string('{\"a\": \"x\"}', '$.a') AS v",
      "SELECT to_json(struct_pack(a := 1)) AS j",
      // aggregates / windows
      "SELECT string_agg(n_name, ',' ORDER BY n_name) AS s FROM nation",
      "SELECT array_agg(n_name ORDER BY n_name) AS l FROM nation WHERE n_regionkey = 0",
      "SELECT quantile_cont(n_regionkey, 0.5) AS q FROM nation",
      "SELECT quantile_disc(n_regionkey, 0.5) AS q FROM nation",
      "SELECT arg_max(n_name, n_nationkey) AS s FROM nation",
      "SELECT bit_xor(n_regionkey) AS x FROM nation",
      "SELECT product(n_regionkey + 1) AS p FROM nation WHERE n_regionkey < 2",
      "SELECT favg(n_regionkey) AS a FROM nation",
      "SELECT count(DISTINCT n_regionkey) FILTER (WHERE n_nationkey > 5) AS c FROM nation",
      // joins
      "SELECT n1.n_name FROM nation n1 SEMI JOIN region r ON n1.n_regionkey = r.r_regionkey ORDER BY 1 LIMIT 1",
      "SELECT n1.n_name FROM nation n1 ANTI JOIN region r ON n1.n_regionkey = r.r_regionkey ORDER BY 1 LIMIT 1",
      "SELECT a.n_name, b.r_name FROM nation a POSITIONAL JOIN region b LIMIT 1",
      // misc
      "SELECT 7 // 2 AS q",
      "SELECT 1 = ANY([1, 2]) AS b",
      "SELECT unnest([1,2,3]) AS x",
      "SELECT * FROM range(3)",
      "SELECT * FROM generate_series(1, 3)",
      "SELECT typeof(1) AS t",
      "SELECT gen_random_uuid() IS NOT NULL AS b",
      "SELECT setseed(0.5)",
      "SELECT n_name FROM nation ORDER BY n_name OFFSET 2 LIMIT 2",
      "SELECT n_name FROM nation LIMIT 2 OFFSET 2",
      "SELECT CAST('1.7' AS DOUBLE)::INT AS i",
      "SELECT if(1 > 0, 'a', 'b') AS s",
      "SELECT ifnull(NULL, 'x') AS s",
      "VALUES (1, 'a'), (2, 'b')",
      "FROM nation SELECT n_name ORDER BY n_name LIMIT 1",
      "FROM nation LIMIT 1",
      "DESCRIBE nation",
      "SELECT coalesce(NULLIF('a','a'), 'b') AS s",
      "SELECT round(2.5::DOUBLE) AS r",
      "SELECT trunc(1.9) AS t",
      "SELECT 'abc' SIMILAR TO 'a.c' AS b",
      "SELECT n_name FROM nation WHERE n_name ~ 'A.*' ORDER BY 1 LIMIT 1",
      "SELECT n_name FROM nation WHERE n_name !~ 'A.*' ORDER BY 1 LIMIT 1",
      "SELECT list_sum([1,2,3]) AS s",
      "SELECT [x + 1 FOR x IN [1,2,3]] AS l",
      "SELECT hash('x') IS NOT NULL AS b",
      "SELECT greatest(1, 2) AS g, least(1, 2) AS l"
    )
    var fails = 0
    cases.foreach { sql =>
      try {
        val out = Dialect.rewrite(spark, sql)
        spark.sql(out).collect()
        println(s"OK    $sql")
      } catch {
        case e: Throwable =>
          fails += 1
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString
          println(s"FAIL  $sql\n      -> ${msg.take(160)}")
      }
    }
    println(s"\n${cases.size - fails}/${cases.size} ok, $fails failing")
    spark.stop()
  }
}
