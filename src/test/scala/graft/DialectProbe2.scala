package graft
object DialectProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      """SELECT '{"a": {"b": 2}}'::JSON -> 'a' AS j""" -> """{"b":2}""",
      """SELECT '{"a": "x"}' -> 'a' AS j""" -> "\"x\"",
      """SELECT '{"a": "x"}' ->> 'a' AS v""" -> "x",
      """SELECT '{"a": 1}' ->> 'a' AS v""" -> "1",
      """SELECT '[5,6]'::JSON -> 1 AS v""" -> "6",
      """SELECT '[5,6]' -> 0 AS v""" -> "5",
      """SELECT '{"a":[1,2]}' -> 'a' -> 1 AS v""" -> "2",
      """SELECT json_extract('{"a": "x"}', '$.a') AS v""" -> "\"x\"",
      """SELECT json_extract('{"a": "x"}', 'a') AS v""" -> "\"x\"",
      """SELECT json_extract('{"a": 1}', '/a') AS v""" -> "1",
      """SELECT json_extract_string('{"a": "x"}', 'a') AS v""" -> "x",
      """SELECT json_value('{"a": 7}', '$.a') AS v""" -> "7",
      """SELECT '{"a": 1}' ->> 'b' AS v""" -> "null",
      """SELECT list_transform([1,2], x -> x * 2) AS l""" -> "[2,4]",
      """SELECT list_filter([1,2,3], x -> x > 1) AS l""" -> "[2,3]"
    )
    var bad = 0
    cases.foreach { case (sql, want) =>
      try {
        val out = graft.server.Dialect.rewrite(spark, sql)
        val row = spark.sql(out).collect()(0)
        val got = if (row.isNullAt(0)) "null" else row.get(0) match {
          case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
          case x => x.toString }
        if (got == want) println(s"OK    $sql => $got")
        else { bad += 1; println(s"BAD   $sql => $got (want $want)\n      rewritten: $out") }
      } catch { case e: Throwable =>
        bad += 1; println(s"ERR   $sql -> ${Option(e.getMessage).getOrElse("?").replace('\n','|').take(200)}")
      }
    }
    println(s"\n${cases.size - bad}/${cases.size} ok")
    spark.stop()
  }
}
