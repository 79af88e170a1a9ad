package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print Dialect.rewrite output for stdin/args SQL. */
object RewriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.injectInto(spark)
    args.foreach { sql =>
      System.err.println(s"IN : $sql")
      try System.err.println(s"OUT: ${graft.server.Dialect.rewrite(spark, sql)}")
      catch { case e: Throwable => System.err.println(s"REWRITE ERR: $e") }
      System.err.println()
    }
    spark.stop()
  }
}
