package graft

import graft.server.Dialect

/** Round-8 second probe tier: list_aggregate family, binary/encoding
  * helpers, bit manipulation, indexed lambdas, histogram/map extras,
  * regex flags, and misc string/format sugar.
  */
object DialectProbe7 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation", "orders")
    val cases = Seq(
      // list_aggregate family
      "SELECT list_aggregate([1, 2, 3], 'sum') AS s",
      "SELECT list_aggregate([1, 2, 3], 'min') AS m",
      "SELECT list_aggregate([1, 2, 3], 'max') AS m",
      "SELECT list_aggregate([1, 2, 3], 'avg') AS a",
      "SELECT list_aggregate([1, 2, 3], 'count') AS c",
      "SELECT list_sum([1, 2, 3]) AS s, list_avg([2.0, 4.0]) AS a",
      "SELECT list_min([3, 1]) AS mn, list_max([3, 1]) AS mx",
      "SELECT list_apply([1, 2], x -> x * 2) AS a",
      // indexed lambda
      "SELECT list_transform(['a', 'b'], (x, i) -> concat(x, i)) AS t",
      "SELECT list_filter([10, 20, 30], (x, i) -> i > 1) AS f",
      // binary / encoding
      "SELECT to_base64(encode('abc')) AS b",
      "SELECT from_base64('YWJj') AS d",
      "SELECT encode('abc') AS e, decode(encode('xyz')) AS d",
      "SELECT format_bytes(1048576) AS f",
      "SELECT formatReadableDecimalSize(1000000) AS f",
      // bit manipulation
      "SELECT bit_count(7) AS c",
      "SELECT get_bit(bitstring('0110', 4), 1) AS g",
      "SELECT set_bit(bitstring('0110', 4), 0, 1) AS s",
      // histogram / map extras
      "SELECT histogram(n_regionkey) AS h FROM nation",
      "SELECT map_extract(MAP {'a': 1}, 'a') AS e",
      "SELECT map_concat(MAP {'a': 1}, MAP {'b': 2}) AS m",
      // regex flags / escapes
      "SELECT regexp_replace('aAa', 'a', 'x', 'gi') AS r",
      "SELECT regexp_replace('aAa', 'a', 'x', 'g') AS r",
      "SELECT regexp_matches('ABC', 'abc', 'i') AS m",
      "SELECT regexp_extract('a1b2', '([a-z])([0-9])', ['l', 'n']) AS g",
      // string sugar
      "SELECT string_to_array('a,b,c', ',') AS l",
      "SELECT array_to_string([1, 2, 3], '-') AS s",
      "SELECT concat_ws('-', 'a', 'b') AS c",
      "SELECT like_escape('a%c', 'a$%c', '$') AS l",
      "SELECT ilike_escape('A%C', 'a$%c', '$') AS l",
      "SELECT hash('abc') AS h",
      "SELECT printf('%5.2f', 3.14159) AS p",
      "SELECT format('{:.2f}', 3.14159) AS f",
      // misc
      "SELECT txid_current() AS t",
      "SELECT current_schema() AS s",
      "SELECT current_database() AS d",
      "SELECT version() AS v",
      "SELECT typeof(1) AS t, typeof('x') AS s, typeof([1]) AS l",
      "SELECT alias(n_nationkey) AS a FROM nation LIMIT 1",
      "SELECT generate_subscripts([10, 20, 30], 1) AS g",
      "SELECT unnest([1, 2, 3]) AS u",
      "SELECT nullif(1, 1) AS n, ifnull(NULL, 2) AS i",
      "SELECT coalesce(NULL, NULL, 3) AS c"
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
    println(s"probe7 done: ${cases.size - fails}/${cases.size} ok")
  }
}
