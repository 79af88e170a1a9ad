package graft
object DialectProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation")
    val cases = Seq(
      "SELECT quantile_disc(n_regionkey, 0.5) AS q FROM nation",
      "SELECT quantile_disc(x, 0.0) AS q FROM VALUES (1),(2),(3) t(x)",
      "SELECT quantile_disc(x, 1.0) AS q FROM VALUES (1),(2),(3) t(x)",
      "SELECT quantile_disc(x, 0.5) AS q FROM VALUES ('b'),('a'),('c') t(x)",
      "SELECT product(x) AS p FROM VALUES (1.5),(2.0),(CAST(NULL AS DOUBLE)) t(x)",
      "SELECT product(x) AS p FROM (SELECT CAST(1 AS DOUBLE) AS x WHERE false) t",
      "SELECT list_reverse_sort(array(1,3,NULL,2)) AS l",
      "SELECT list_unique(array(1,1,NULL,2,NULL)) AS n",
      "SELECT format('{}-{}', 7, 'x') AS s",
      "SELECT format('{0}-{1}-{0}', 'a', 'b') AS s",
      "SELECT format('{:.2f}', 3.14159) AS s",
      "SELECT format('{:5d}|', 42) AS s",
      "SELECT regexp_extract('a1b2', '[0-9]') AS s",
      "SELECT trunc(1.9) AS t, trunc(-1.9) AS u, trunc(1.9D) AS v"
    )
    cases.foreach { sql =>
      try {
        val row = spark.sql(sql).collect()(0)
        val got = (0 until row.length).map(i => if (row.isNullAt(i)) "null" else row.get(i) match {
          case a: scala.collection.Seq[_] => a.map(x => if (x == null) "null" else x).mkString("[", ",", "]")
          case x => x.toString }).mkString(", ")
        println(s"OK    $sql => $got")
      } catch { case e: Throwable =>
        println(s"ERR   $sql -> ${Option(e.getMessage).getOrElse("?").linesIterator.take(1).mkString.take(140)}")
      }
    }
    spark.stop()
  }
}
