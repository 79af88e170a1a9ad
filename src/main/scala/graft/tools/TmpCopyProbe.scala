package graft.tools
object TmpCopyProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.sql("SELECT * FROM (VALUES (1, 'a,x', CAST(NULL AS DOUBLE)), (2, 'b', 3.5)) v(i, s, d)")
    df.coalesce(1).write.mode("overwrite").option("header", true).csv("/tmp/tc_csv")
    df.coalesce(1).write.mode("overwrite").option("ignoreNullFields","false").json("/tmp/tc_json")
    spark.stop()
  }
}
