package graft

import graft.server.Dialect

/** Round-12 probe tier 22: the two highest-traffic dialect louds
  * closed (round-11 verdict ask #4) — runtime-keyed JSON text arrows
  * and count(DISTINCT) over windows — plus the negative space that
  * must STAY intact (lambdas, multi-param lambda heads, `->` with a
  * runtime key = loud). DuckDB ground truth pinned alongside (run
  * 2026-08-15).
  */
object DialectProbe22 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: '1','x' (runtime string key; scalars unquote)
      """SELECT j ->> k AS v FROM (VALUES ('{"a":1,"b":"x"}', 'a'), ('{"a":1,"b":"x"}', 'b')) t(j, k) ORDER BY v""",
      // duck: '20' (runtime integer index, 0-based)
      "SELECT j ->> i AS v FROM (VALUES ('[10,20,30]', 1)) t(j, i)",
      // duck: NULL (missing key)
      """SELECT j ->> k AS v FROM (VALUES ('{"a":1}', 'z')) t(j, k)""",
      // duck: '{"c":2}' (object value renders as JSON text under ->>)
      """SELECT j ->> k AS v FROM (VALUES ('{"a":{"c":2}}', 'a')) t(j, k)""",
      // lambdas must SURVIVE the identifier-right-operand extension:
      // single param, multi param, lambda with identifier body
      "SELECT list_transform([1, 2], x -> x + 1) AS a",
      "SELECT list_reduce([1, 2, 3], (a, b) -> a * 16 + b) AS r",
      // duck: [(1,10,2),(1,10,2),(1,20,2),(2,30,1)]
      "SELECT p, x, count(DISTINCT x) OVER (PARTITION BY p) AS c FROM (VALUES (1,10),(1,10),(1,20),(2,30)) t(p,x) ORDER BY p, x",
      // duck: bounded ROWS frame [(10,1),(10,1),(20,2),(20,1)]
      "SELECT x, count(DISTINCT x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c FROM (VALUES (1,10),(2,10),(3,20),(4,20)) t(i,x) ORDER BY i",
      // duck: default RANGE frame [(10,1),(10,1),(20,2)]
      "SELECT x, count(DISTINCT x) OVER (ORDER BY i) AS c FROM (VALUES (1,10),(2,10),(3,20)) t(i,x) ORDER BY i",
      // duck: NULLs ignored -> 1
      "SELECT count(DISTINCT x) OVER (PARTITION BY p) AS c FROM (VALUES (1,CAST(NULL AS INT)),(1,10),(1,NULL)) t(p,x) LIMIT 1",
      // named-window spelling
      "SELECT count(DISTINCT x) OVER w AS c FROM (VALUES (1,10),(1,10)) t(p,x) WINDOW w AS (PARTITION BY p) LIMIT 1")
    var fails = 0
    cases.foreach { sql =>
      try {
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(110)}\n  -> ${rows.mkString("; ").take(200)}")
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(110)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(200)}")
      }
    }
    // the forms that must STAY loud
    Seq(
      """SELECT j -> k AS v FROM (VALUES ('{"a":{"c":2}}', 'a')) t(j, k)""",
      "SELECT sum(DISTINCT x) OVER (PARTITION BY p) AS s FROM (VALUES (1,10),(1,10)) t(p,x)"
    ).foreach { sql =>
      try {
        Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        fails += 1
        println(s"FAIL (should be loud): ${sql.take(100)}")
      } catch {
        case e: Throwable =>
          println(s"LOUD: ${sql.take(100)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(140)}")
      }
    }
    println(s"probe22 done: fails=$fails")
  }
}
