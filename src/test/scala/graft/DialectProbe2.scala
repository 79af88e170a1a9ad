package graft
object DialectProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation")
    val cases = Seq(
      "SELECT string_agg(x, ',' ORDER BY x DESC) AS s FROM VALUES ('a'),('b') t(x)" -> "b,a",
      "SELECT string_agg(x ORDER BY x DESC) AS s FROM VALUES ('a'),('b') t(x)" -> "b,a",
      "SELECT array_agg(x ORDER BY x) AS l FROM VALUES (2),(1) t(x)" -> "[1,2]",
      "SELECT array_agg(x ORDER BY x DESC) AS l FROM VALUES (2),(1) t(x)" -> "[2,1]",
      "SELECT array_agg(x ORDER BY y DESC) AS l FROM VALUES (1,'a'),(2,'b') t(x,y)" -> "[2,1]",
      "SELECT array_agg(DISTINCT x ORDER BY x) AS l FROM VALUES (2),(1),(2) t(x)" -> "[1,2]",
      "SELECT list(x ORDER BY x DESC) AS l FROM VALUES (1),(2) t(x)" -> "[2,1]",
      "SELECT list(x) AS l FROM VALUES (1),(2) t(x)" -> "[1,2]",
      "SELECT 'Abc' ~ 'A.*' AS a, 'Abc' ~ '^A' AS b, 'Abc' !~ 'z.*' AS c" -> "true, false, true",
      "SELECT 'Abc' ~~ 'A%' AS a, 'Abc' !~~ 'A%' AS b" -> "true, false",
      "SELECT n_name FROM nation ORDER BY n_name OFFSET 2 LIMIT 2" -> "2rows",
      "SELECT ~5 AS x" -> "-6"
    )
    var bad = 0
    cases.foreach { case (sql, want) =>
      try {
        val out = graft.server.Dialect.rewrite(spark, sql)
        val rows = spark.sql(out).collect()
        val got = if (want == "2rows") s"${rows.length}rows" else {
          val row = rows(0)
          (0 until row.length).map(i => if (row.isNullAt(i)) "null" else row.get(i) match {
            case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
            case x => x.toString }).mkString(", ")
        }
        if (got == want) println(s"OK    $sql => $got")
        else { bad += 1; println(s"BAD   $sql => $got (want $want)\n      rewritten: $out") }
      } catch { case e: Throwable =>
        bad += 1; println(s"ERR   $sql -> ${Option(e.getMessage).getOrElse("?").replace('\n','|').take(180)}")
      }
    }
    println(s"\n${cases.size - bad}/${cases.size} ok")
    spark.stop()
  }
}
