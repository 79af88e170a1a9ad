package graft

import graft.server.Dialect

/** Round-12 probe tier 24: type-coercion/unification + empty-aggregate
  * family. DuckDB ground truth run 2026-08-15 (values in comments).
  * Found and closed: list/array_agg NULL-keeping + NULL-on-empty (in
  * group-by AND window contexts). Documented-divergence residue:
  * mixed string/numeric UNION branch unification (VARCHAR there,
  * DOUBLE here — integer-valued rows render 3.0 vs 3) and int=bool
  * comparisons (bool casts to int there, loud analysis error here).
  */
object DialectProbe24 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: '1.0','2.5','3' VARCHAR
      "SELECT 1 AS a UNION ALL SELECT 2.5 UNION ALL SELECT '3'",
      // duck: ERROR (string->int conversion)
      "SELECT 'abc' = 0 AS c",
      // duck: true
      "SELECT '5' = 5 AS a",
      // duck: true, true
      "SELECT 5 IN ('5', 6) AS a, '5' IN (5, 6) AS b",
      // duck: 1 INTEGER
      "SELECT CASE WHEN true THEN 1 ELSE '2' END AS a",
      // duck: 1 INTEGER
      "SELECT coalesce(NULL, 1, '2') AS a",
      // duck: true, true
      "SELECT 1 = true AS a, 0 = false AS b",
      // duck: true
      "SELECT '2024-01-01' = DATE '2024-01-01' AS a",
      // duck: true, true (3/2 is int division = 1; 1.5 = 1 false!? no -> got true: 3/2 under our div retype is 1.5)
      "SELECT 1.5 = 3/2 AS a, 1 = 1.0 AS b",
      // duck: '1a2.5','1a'
      "SELECT concat(1, 'a', 2.5, NULL) AS a, 1 || 'a' AS b",
      // duck: [1.0,2.5] DECIMAL[], [1,2] INTEGER[]
      "SELECT [1, 2.5] AS a, [1, '2'] AS b",
      // duck: NULL, NULL
      "SELECT NULL + 1 AS a, NULL || 'x' AS b",
      // duck: NULL,NULL,NULL,0,NULL on empty input
      "SELECT sum(x) AS s, avg(x) AS a, min(x) AS m, count(x) AS c, string_agg(x, ',') AS g FROM (SELECT 1 AS x WHERE false) t",
      // duck: NULL
      "SELECT list(x) AS l FROM (SELECT 1 AS x WHERE false) t",
      // duck: false, true
      "SELECT 2 BETWEEN 3 AND 1 AS a, 2 BETWEEN 1 AND 3 AS b",
      // duck: NULL,false,true,NULL
      "SELECT true AND NULL AS a, false AND NULL AS b, true OR NULL AS c, NOT NULL AS d",
      // duck: true,true,true
      "SELECT CAST('true' AS BOOLEAN) AS a, CAST('t' AS BOOLEAN) AS b, CAST('1' AS BOOLEAN) AS c",
      // duck: true,false,1
      "SELECT CAST(1.9 AS BOOLEAN) AS a, CAST(0 AS BOOLEAN) AS b, CAST(true AS INT) AS c")
    cases.foreach { sql =>
      try {
        val df = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql))
        val rows = df.collect()
        println(s"OK  : ${sql.take(120)}\n  -> ${rows.mkString("; ").take(200)}  [${df.schema.map(_.dataType.simpleString).mkString(",")}]")
      } catch {
        case e: Throwable =>
          println(s"ERR : ${sql.take(120)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(160)}")
      }
    }
  }
}
