package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import graft.{GraftSession, SparkEntry}

/** Dev tool: sweeps EVERY registered query's physical plan for scale
  * smells — the automated face of "explain until it's the plan you'd
  * want". Flags:
  *   - CartesianProduct / non-broadcast nested-loop joins
  *   - parquet scans with neither pushed filters nor column pruning
  *   - unusually shuffle-heavy plans (Exchange count)
  * `sbt 'runMain graft.tools.AuditPlans /root/testdata/sf0.01'`
  * Exit code 1 if a CartesianProduct shows up anywhere.
  */
object AuditPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    // audit with AQE OFF: AdaptiveSparkPlanExec hides its children until
    // execution, so the adaptive wrapper would blind the sweep. Raw module
    // queries skip the per-call tune() (which re-enables AQE).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var cartesians = 0
    val raw = SparkEntry.modules.flatMap(_.queries).map(q => q.name -> q.fn)
    raw.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan
        def collectAll(p: SparkPlan): Seq[SparkPlan] =
          (p +: p.children.flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
        val nodes = collectAll(plan)
        val names = nodes.map(_.nodeName)
        val nCart = names.count(_.contains("CartesianProduct"))
        val nBnl = names.count(_.contains("BroadcastNestedLoop"))
        val nEx = names.count(n => n.contains("Exchange") && !n.contains("Broadcast") && !n.contains("Reused"))
        val fullScans = nodes.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.dataFilters.isEmpty && f.partitionFilters.isEmpty &&
                 f.requiredSchema.length == f.relation.dataSchema.length &&
                 f.relation.dataSchema.length > 3 =>
            f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?")
        }
        cartesians += nCart
        val flags = Seq(
          if (nCart > 0) Some(s"CARTESIAN x$nCart") else None,
          if (nBnl > 0) Some(s"bnlj x$nBnl") else None,
          if (nEx > 4) Some(s"shuffles=$nEx") else None,
          if (fullScans.nonEmpty) Some(s"full-scan:${fullScans.mkString("/")}") else None
        ).flatten
        if (flags.nonEmpty) println(f"$name%-30s ${flags.mkString("  ")}")
      } catch {
        case e: Throwable => println(f"$name%-30s PLAN-ERROR ${e.getMessage.take(80)}")
      }
    }
    println(s"audit done: cartesians=$cartesians")
    spark.stop()
    if (cartesians > 0) sys.exit(1)
  }
}
