package graft

import graft.server.Dialect

/** Round-11b probe tier 13: TRY_CAST edges, numeric predicates
  * (even/signbit/isfinite/isnan/cot/gamma), the entropy aggregate,
  * base64/printf/format spellings, flatten/list_unique/list_value/
  * list_resize/list_reduce, map cardinality, and bit_xor.
  */
object DialectProbe13 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation")
    val cases = Seq(
      "SELECT TRY_CAST('x' AS INTEGER) a, TRY_CAST('12.7' AS INTEGER) b, TRY_CAST(' 5 ' AS INTEGER) c",
      "SELECT even(2.1) a, even(-2.1) b, signbit(-1.5) c, isfinite(1.0) d, isnan(sqrt(4)) e",
      "SELECT cot(1.0) a, gamma(5) b, lgamma(5) c",
      "SELECT round(entropy(x), 6) a FROM (VALUES (1),(1),(2),(3)) t(x)",
      "SELECT median(x) a FROM (VALUES (1),(2),(3),(4)) t(x)",
      "SELECT make_date(2024,2,29) a, date_add(DATE '2024-01-31', INTERVAL 1 MONTH) b",
      "SELECT unicode('abc') a, reverse('abc') b, printf('%d-%s', 7, 'x') c, format('{}-{}', 1, 'y') d",
      "SELECT to_base64(CAST('abc' AS BLOB)) a, from_base64('YWJj') b",
      "SELECT flatten([[1,2],[3]]) a, list_unique([1,2,2,3]) b, list_value(1,2) c",
      "SELECT map_keys(MAP {'a':1,'b':2}) a, map_values(MAP {'a':1}) b, cardinality(MAP {'a':1,'b':2}) c",
      "SELECT list_reduce([1,2,3], (x,y) -> x+y) a, list_aggregate([1,2,3], 'sum') b",
      "SELECT bit_xor(x) a FROM (VALUES (5),(3)) t(x)",
      "SELECT [1,2] || [3] AS a, len([1,2,3]) b, list_resize([1,2],4,0) c")
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
    println(s"probe13 done: ${cases.size - fails}/${cases.size} ok")
  }
}
