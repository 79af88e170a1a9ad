package graft

import graft.server.Dialect

/** Round-11 probe tier 18: the list-lambda long tail — reduce, where,
  * select, grade_up, zip (with shorter-side NULL fill), has_any/all,
  * flatten one-level, cosine/dot kernels, list_aggregate by name,
  * apply alias, comprehension with filter. DuckDB ground truth pinned
  * alongside each case (run 2026-08-15; TRY() doesn't exist in this
  * DuckDB — not a surface).
  */
object DialectProbe18 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: 6
      "SELECT list_reduce([1,2,3], (a, b) -> a + b) AS r",
      // duck: [10, 30]
      "SELECT list_where([10,20,30], [true,false,true]) AS w",
      // duck: [30, 10] (1-based index selection)
      "SELECT list_select([10,20,30], [3,1]) AS s",
      // duck: [2, 3, 1] (1-based positions that would sort the list)
      "SELECT list_grade_up([30,10,20]) AS g",
      // duck: [(1,a),(2,b),(NULL,c)] — zips to the LONGER side
      "SELECT list_zip([1,2],['a','b','c']) AS z",
      // duck: true, true
      "SELECT list_has_any([1,2],[2,3]) AS a, list_has_all([1,2,3],[2,3]) AS b",
      // duck: [1,2,3]
      "SELECT flatten([[1,2],[3]]) AS f",
      // duck: 0.0, 11.0
      "SELECT list_cosine_similarity([1.0,0.0],[0.0,1.0]) AS c, list_dot_product([1.0,2.0],[3.0,4.0]) AS d",
      // duck: 2 (intersect dedups), 2 / [1,2]
      "SELECT len(list_intersect([1,2,2,3],[2,3,4])) AS i",
      // duck: [2,3] (inclusive 1-based slice)
      "SELECT array_slice([1,2,3,4], 2, 3) AS a",
      // duck: 6, 'a-b'
      "SELECT list_aggregate([1,2,3], 'sum') AS s, list_aggregate(['a','b'], 'string_agg', '-') AS g",
      // duck: [2,4]
      "SELECT list_apply([1,2], x -> x * 2) AS a",
      // duck: [4,6]
      "SELECT [x * 2 FOR x IN [1,2,3] IF x > 1] AS c")
    var fails = 0
    cases.foreach { sql =>
      try {
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(110)}\n  -> ${rows.mkString("; ").take(200)}")
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(110)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(160)}")
      }
    }
    println(s"probe18 done: ${cases.size - fails}/${cases.size} ok")
  }
}
