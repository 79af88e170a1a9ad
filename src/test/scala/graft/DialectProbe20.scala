package graft

import graft.server.Dialect

/** Round-11 probe tier 20: the JSON long tail — bracketed paths,
  * array_length/keys/valid/type/contains, RFC-7386 merge_patch,
  * quote, the group aggregates — plus sha256/hash. DuckDB ground
  * truth pinned alongside each case (run 2026-08-15; sha1 does not
  * exist in this DuckDB).
  */
object DialectProbe20 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: '2'
      """SELECT json_extract('{"a": [1, {"b": 2}]}', '$.a[1].b') AS x""",
      // duck: 3, ['a','b']
      """SELECT json_array_length('[1,2,3]') AS n, json_keys('{"a":1,"b":2}') AS k""",
      // duck: true, false
      """SELECT json_valid('{"a":1}') AS v, json_valid('nope') AS w""",
      // duck: {"a":1,"c":3} (RFC 7386: null deletes)
      """SELECT json_merge_patch('{"a":1,"b":2}', '{"b":null,"c":3}') AS m""",
      // duck: OBJECT, ARRAY, UBIGINT
      """SELECT json_type('{"a":1}') AS t, json_type('[1]') AS u, json_type('1') AS v""",
      // duck: true
      """SELECT json_contains('{"a":1}', '1') AS c""",
      // duck: '1'
      """SELECT '{"a":1}'::JSON ->> 'a' AS x""",
      // duck: '42'
      "SELECT json_quote(42) AS q",
      // duck: '[1,2]', '{"a":1,"b":2}'
      "SELECT json_group_array(x) AS a FROM (VALUES (1),(2)) t(x)",
      "SELECT json_group_object(k, v) AS o FROM (VALUES ('a',1),('b',2)) t(k,v)",
      // duck: 64-char hex; hash() is engine-specific (documented)
      "SELECT sha256('ab') AS s, md5('ab') AS m")
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
    println(s"probe20 done: ${cases.size - fails}/${cases.size} ok")
  }
}
