package graft

import graft.server.Dialect

/** Round-12 probe tier 27: NULL-aware IN, complex-type grouping and
  * comparison, percent LIMIT, set-operation duplicates. DuckDB ground
  * truth run 2026-08-15 (values in comments).
  *
  * Matching + pinned: literal NOT IN with NULLs (NULL, not false),
  * GROUP BY/ORDER BY on LIST and STRUCT keys, list lexicographic
  * comparison, IS [NOT] DISTINCT FROM, INTERSECT ALL duplicates,
  * EXCEPT dedup, list ordering with the probe-26 NULLS LAST default.
  * Documented-divergence residue (COVERAGE omissions): NOT IN
  * (subquery) as a PROJECTED value when the subquery has NULLs
  * (false here vs NULL there — WHERE-context semantics agree), MAP
  * keys in DISTINCT/set ops (loud Spark error), LIMIT n%% (loud parse
  * error), array equality over NULL elements (true here vs NULL
  * there).
  */
object DialectProbe27 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    Seq(
      "SELECT 1 NOT IN (2, NULL) AS a, 1 IN (1, NULL) AS b, 1 IN (2, NULL) AS c",                 // duck NULL,true,NULL
      "SELECT 3 NOT IN (SELECT x FROM (VALUES (1),(NULL)) t(x)) AS a",                            // duck NULL
      "SELECT x, count(*) c FROM (VALUES ([1,2]),([1,2]),([3])) t(x) GROUP BY x ORDER BY c DESC", // duck ([1,2],2),([3],1)
      "SELECT x, count(*) c FROM (VALUES ({'a':1}),({'a':1}),({'a':2})) t(x) GROUP BY x ORDER BY c DESC",
      "SELECT DISTINCT x FROM (VALUES (MAP([1],[2])),(MAP([1],[2]))) t(x)",                       // duck one row
      "SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) t(x) ORDER BY x LIMIT 20%", // duck 1,2
      "SELECT [1,2] = [1,2] AS a, [1,2] < [1,3] AS b, {'a':1} = {'a':1} AS c, [1,NULL] = [1,NULL] AS d", // t,t,t,NULL
      "SELECT x FROM (VALUES ([2]),([1,5]),(NULL),([1])) t(x) ORDER BY x",                        // [1],[1,5],[2],NULL
      "SELECT 1 IS DISTINCT FROM NULL AS a, NULL IS NOT DISTINCT FROM NULL AS b",                 // t,t
      "SELECT x FROM (VALUES (1),(2),(2)) t(x) INTERSECT ALL SELECT x FROM (VALUES (2),(2),(3)) t(x)", // 2,2
      "SELECT x FROM (VALUES (1),(2),(2)) t(x) EXCEPT SELECT x FROM (VALUES (2)) t(x)"            // 1
    ).foreach { sql =>
      try {
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(110)}\n  -> ${rows.mkString("; ").take(160)}")
      } catch { case e: Throwable =>
        println(s"ERR : ${sql.take(110)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(150)}")
      }
    }
  }
}
