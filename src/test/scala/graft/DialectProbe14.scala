package graft

import graft.server.Dialect

/** Round-11b probe tier 14: windowed-aggregate surface — named WINDOW
  * clauses, interval RANGE frames, FILTER and DISTINCT over windows,
  * list step-slicing, recursive unnest, mode as a window function.
  */
object DialectProbe14 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation")
    val cases = Seq(
      "SELECT x, sum(x) OVER w AS s FROM (VALUES (1),(2),(3)) t(x) WINDOW w AS (ORDER BY x) ORDER BY x",
      "SELECT ts, count(*) OVER (ORDER BY ts RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW) c " +
        "FROM (VALUES (TIMESTAMP '2024-01-01'),(TIMESTAMP '2024-01-02'),(TIMESTAMP '2024-01-05')) t(ts) ORDER BY ts",
      "SELECT x, count(*) FILTER (WHERE x > 1) OVER (ORDER BY x) c FROM (VALUES (1),(2),(3)) t(x) ORDER BY x",
      "SELECT x, count(DISTINCT y) OVER (ORDER BY x) c FROM (VALUES (1,1),(2,1),(3,2)) t(x,y) ORDER BY x",
      "SELECT ([1,2,3,4,5,6])[1:5:2] AS a",
      "SELECT unnest([[1,2],[3]], recursive := true) AS u",
      "SELECT x, mode(y) OVER (ORDER BY x) m FROM (VALUES (1,7),(2,7),(3,8)) t(x,y) ORDER BY x")
    var fails = 0
    cases.foreach { sql =>
      try {
        val rows = spark.sql(Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(110)}\n  -> ${rows.mkString("; ").take(160)}")
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(110)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(140)}")
      }
    }
    println(s"probe14 done: ${cases.size - fails}/${cases.size} ok")
  }
}
