package graft

import graft.server.Dialect

/** Round-11b probe tier: NULL-handling and boundary semantics on the
  * variadic/string/list surface — concat's NULL-skip (DuckDB skips,
  * Spark nulls the whole result), reverse-sort null placement, slice
  * clamping, split-by-empty, epoch typing, shifts and age().
  */
object DialectProbe12 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation")
    val cases = Seq(
      "SELECT concat('a', NULL, 'b') AS a, 'a' || NULL AS b",
      "SELECT concat_ws('-', 'a', NULL, 'b') AS a",
      "SELECT greatest(1, NULL) AS a, least(1, NULL) AS b",
      "SELECT atan2(1.0, 2.0) AS a, pow(0,0) AS b, 0^0 AS c",
      "SELECT round(2.5) AS a, round(-2.5) AS b, round(CAST(2.5 AS DOUBLE)) AS c, round(CAST(3.345 AS DOUBLE), 2) AS d",
      "SELECT -7 % 3 AS a, -7 // 2 AS b, 7 // -2 AS c",
      "SELECT date_trunc('week', DATE '2024-01-07') AS a",
      "SELECT list_sort([3, NULL, 1]) AS a, list_reverse_sort([3, NULL, 1]) AS b",
      "SELECT 'abcdef'[2:4] AS a",
      "SELECT ([1,2,3,4])[-2:] AS a, list_slice([1,2,3,4], 2, 99) AS b",
      "SELECT strpos('hello', 'll') AS a, strpos('hello', 'zz') AS b, instr('hello','l') AS c",
      "SELECT list_position([1,2,3], 2) AS a, list_position([1,2,3], 9) AS b",
      "SELECT string_split('abc', '') AS a, string_split('a,,b', ',') AS b",
      "SELECT extract(epoch FROM TIMESTAMP '2024-01-01 00:00:30') AS a, extract(dow FROM DATE '2024-01-07') AS b, extract(doy FROM DATE '2024-02-01') AS c",
      "SELECT 1 << 3 AS a, -8 >> 1 AS b",
      "SELECT age(TIMESTAMP '2024-03-15 10:00:00', TIMESTAMP '2024-01-10 09:00:00') AS a")
    var fails = 0
    cases.foreach { sql =>
      try {
        val rows = spark.sql(Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(100)}\n  -> ${rows.mkString("; ").take(200)}")
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(100)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(140)}")
      }
    }
    println(s"probe12 done: ${cases.size - fails}/${cases.size} ok")
  }
}
