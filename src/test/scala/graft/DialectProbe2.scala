package graft
object DialectProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-01-08') AS x" -> "7",
      "SELECT date_diff('day', DATE '2024-01-08', DATE '2024-01-01') AS x" -> "-7",
      "SELECT datediff('month', DATE '2024-01-31', DATE '2024-03-01') AS x" -> "2",
      "SELECT date_diff('year', DATE '2023-12-31', DATE '2024-01-01') AS x" -> "1",
      "SELECT date_diff('quarter', DATE '2024-03-31', DATE '2024-04-01') AS x" -> "1",
      "SELECT date_diff('week', DATE '2024-01-07', DATE '2024-01-08') AS x" -> "1",
      "SELECT date_diff('hour', TIMESTAMP '2024-01-01 10:59:59', TIMESTAMP '2024-01-01 11:00:01') AS x" -> "1",
      "SELECT date_diff('minute', TIMESTAMP '2024-01-01 00:00:59', TIMESTAMP '2024-01-01 00:01:01') AS x" -> "1",
      "SELECT date_diff('ms', TIMESTAMP '2024-01-01 00:00:00.0015', TIMESTAMP '2024-01-01 00:00:00.0034') AS x" -> "2",
      "SELECT date_diff('microseconds', TIMESTAMP '2024-01-01 10:00:00', TIMESTAMP '2024-01-01 10:00:01') AS x" -> "1000000",
      "SELECT date_diff('day', TIMESTAMP '2024-01-01 23:59:59', TIMESTAMP '2024-01-02 00:00:01') AS x" -> "1",
      "SELECT datediff(DATE '2024-01-08', DATE '2024-01-01') AS x" -> "7"
    )
    var bad = 0
    cases.foreach { case (sql, want) =>
      try {
        val out = graft.server.Dialect.rewrite(spark, sql)
        val row = spark.sql(out).collect()(0)
        val got = if (row.isNullAt(0)) "null" else row.get(0).toString
        if (got == want) println(s"OK    $sql => $got")
        else { bad += 1; println(s"BAD   $sql => $got (want $want)") }
      } catch { case e: Throwable =>
        bad += 1; println(s"ERR   $sql -> ${Option(e.getMessage).getOrElse("?").replace('\n','|').take(160)}")
      }
    }
    println(s"\n${cases.size - bad}/${cases.size} ok")
    spark.stop()
  }
}
