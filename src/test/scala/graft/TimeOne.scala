package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "n_dedup_ensemble"
    val fn = SparkEntry.queries(name)
    spark.range(100000L).selectExpr("sum(id)").collect()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      println(f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
