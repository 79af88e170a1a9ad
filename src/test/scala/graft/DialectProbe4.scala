package graft
import graft.server.Dialect
object DialectProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    T.views(spark, TestSpark.sf, "nation", "region")
    val csv = java.nio.file.Files.createTempFile("p4", ".csv")
    java.nio.file.Files.writeString(csv, "a,b\n1,x\n2,y\n")
    val cases = Seq(
      s"SELECT * FROM read_csv_auto('$csv')",
      s"SELECT * FROM read_csv('$csv', header = true)",
      s"SELECT * FROM parquet_scan('/root/testdata/sf0.001/nation.parquet')",
      s"SELECT * FROM read_parquet('/root/testdata/sf0.001/nation.parquet') LIMIT 1",
      "EXPLAIN SELECT 1",
      "DESCRIBE nation",
      "SHOW TABLES",
      "SELECT * FROM (DESCRIBE nation) LIMIT 1",
      "SUMMARIZE nation",
      "VALUES (1, 'a'), (2, 'b')",
      "FROM nation SELECT n_name LIMIT 1",
      "FROM nation LIMIT 1",
      "SELECT 1 WHERE 1 = 1",
      "SELECT CAST('2024-01-01' AS DATE) + 1 AS d",
      "SELECT DATE '2024-01-01' + INTERVAL 1 DAY AS d",
      "SELECT 'a' || 'b' || NULL AS s",
      "SELECT NULL IS DISTINCT FROM 1 AS d",
      "SELECT 3 BETWEEN 1 AND 5 AS b",
      "SELECT trim(BOTH 'x' FROM 'xax') AS t",
      "SELECT substring('hello' FROM 2 FOR 3) AS s",
      "SELECT extract('year' FROM DATE '2024-03-05') AS y",
      "SELECT CAST(1 AS UBIGINT) AS u",
      "SELECT 1::INT1 AS t, 1::INT2 AS s2, 1::INT4 AS i, 1::INT8 AS b2",
      "SELECT 1.5::FLOAT4 AS f, 1.5::FLOAT8 AS d",
      "SELECT 'abc'::VARCHAR AS v, 'abc'::TEXT AS t2, 'a'::BPCHAR AS c2",
      "SELECT '2024-01-01'::TIMESTAMPTZ IS NOT NULL AS t",
      "SELECT {'a': 1}.a AS v",
      "SELECT [1,2,3] = [1,2,3] AS eq",
      "SELECT row(1, 'x') AS r",
      "SELECT * FROM (VALUES (1)) t(x) POSITIONAL JOIN (VALUES (2)) s(y)"
    )
    var fails = 0
    cases.foreach { sql =>
      try {
        spark.sql(Dialect.rewrite(spark, sql)).collect()
      } catch {
        case e: Throwable =>
          fails += 1
          println(s"FAIL: ${sql.take(80)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(110)}")
      }
    }
    println(s"probe4 done: ${cases.size - fails}/${cases.size} ok")
  }
}
