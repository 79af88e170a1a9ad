package graft
import graft.server.Dialect
object DialectProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      "SELECT 'abcdef'[2:4] AS s"      -> "bcd",
      "SELECT 'abcdef'[0:3] AS s"      -> "abc",
      "SELECT 'abcdef'[4:2] AS s"      -> "",
      "SELECT 'abcdef'[-3:-1] AS s"    -> "def",
      "SELECT 'abcdef'[-3:6] AS s"     -> "def",
      "SELECT 'abcdef'[2:100] AS s"    -> "bcdef",
      "SELECT 'abcdef'[-100:2] AS s"   -> "ab",
      "SELECT 'abcdef'[2:] AS s"       -> "bcdef",
      "SELECT 'abcdef'[:-2] AS s"      -> "abcde",
      "SELECT 'abc'[2] AS s"           -> "b",
      "SELECT 'abc'[0] AS s"           -> "",
      "SELECT 'abc'[-1] AS s"          -> "c",
      "SELECT 'abc'[5] AS s"           -> "",
      "SELECT [1,2,3,4][0:3] AS x"     -> "[1,2,3]",
      "SELECT [1,2,3,4][4:2] AS x"     -> "[]",
      "SELECT [1,2,3,4][-3:-1] AS x"   -> "[2,3,4]",
      "SELECT [1,2,3,4][2:100] AS x"   -> "[2,3,4]",
      "SELECT [1,2,3,4][1:-1] AS x"    -> "[1,2,3,4]",
      "SELECT [1,2][0] AS x"           -> "null",
      "SELECT [1,2][-1] AS x"          -> "2",
      "SELECT [1,2][5] AS x"           -> "null",
      "SELECT list_slice([1,2,3,4], 2, 3) AS x" -> "[2,3]",
      "SELECT list_slice([1,2,3,4], -2, -1) AS x" -> "[3,4]",
      "SELECT list_slice([1,2,3], NULL, 2) AS x" -> "null",
      "SELECT [1] || [2] AS x"         -> "[1,2]",
      "SELECT map {'k':1}['k'] AS x"   -> "1",
      "SELECT CAST(NULL AS STRING)[2:3] AS s" -> "null"
    )
    var bad = 0
    cases.foreach { case (sql, want) =>
      try {
        val out = Dialect.rewrite(spark, sql)
        val row = spark.sql(out).collect()(0)
        val got = if (row.isNullAt(0)) "null" else row.get(0) match {
          case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
          case x => x.toString
        }
        if (got == want) println(s"OK    $sql => $got")
        else { bad += 1; println(s"BAD   $sql => $got (want $want)\n      rewritten: $out") }
      } catch { case e: Throwable =>
        bad += 1
        println(s"ERR   $sql -> ${Option(e.getMessage).getOrElse("?").linesIterator.take(1).mkString.take(160)}")
      }
    }
    println(s"\n${cases.size - bad}/${cases.size} ok")
    spark.stop()
  }
}
