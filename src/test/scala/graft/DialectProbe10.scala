package graft

import graft.server.Dialect

/** Round-10 probe tier: named WINDOW clauses, struct star expansion,
  * filtered list comprehensions, stepped slices, the date_sub part
  * form, in-aggregate DISTINCT with delimiter, and assorted
  * still-unpinned spellings surfaced by a fresh DuckDB sweep.
  */
object DialectProbe10 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation", "orders")
    val cases = Seq(
      // named WINDOW clause (+ two consumers of one definition)
      "SELECT n_name, sum(n_regionkey) OVER w AS s FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name) ORDER BY n_name LIMIT 3",
      "SELECT n_name, rank() OVER w AS r, count(*) OVER w AS c FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name) ORDER BY n_name LIMIT 3",
      // struct star expansion
      "SELECT s.* FROM (SELECT {'a': 1, 'b': 'x'} AS s) t",
      "SELECT (SELECT {'a': 1}).a AS v",
      "SELECT r['a'] AS v FROM (SELECT {'a': 7} r) t",
      // TRY_CAST edges
      "SELECT TRY_CAST('x' AS INT) AS a, TRY_CAST('5' AS INT) AS b",
      // filtered comprehension
      "SELECT [x + 1 FOR x IN [1, 2, 3] IF x > 1] AS l",
      // full-frame window navigation
      "SELECT last_value(n_name) OVER (ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l FROM nation LIMIT 1",
      "SELECT nth_value(n_name, 2) OVER (ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l FROM nation LIMIT 1",
      // in-aggregate DISTINCT with delimiter
      "SELECT string_agg(DISTINCT CAST(n_regionkey AS VARCHAR), ',' ORDER BY CAST(n_regionkey AS VARCHAR)) AS s FROM nation",
      // stepped slice + subscripts
      "SELECT list_slice([1,2,3,4,5], 1, 5, 2) AS l",
      "SELECT 'abc'[2] AS ch",
      "SELECT ('abc')[-1] AS ch",
      // alias + part-form temporal sugar
      "SELECT str_split_regex('a1b', '[0-9]') AS l",
      "SELECT weekday(DATE '2024-02-11') AS w",
      "SELECT timezone_hour(TIMESTAMP '2024-01-01 00:00:00') AS h",
      "SELECT to_centuries(1) AS c",
      "SELECT date_sub('day', DATE '2024-01-01', DATE '2024-03-05') AS n",
      "SELECT dayname(TIMESTAMP '2024-02-10 10:00:00') AS d",
      "SELECT a FROM (VALUES (1), (2)) t(a) WHERE a IN (SELECT unnest([1]))")
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
    println(s"probe10 done: ${cases.size - fails}/${cases.size} ok")
  }
}
