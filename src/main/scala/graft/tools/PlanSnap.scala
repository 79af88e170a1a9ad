package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Round-15 optimization evidence: dumps `explain(formatted)` for the
  * named queries to plans/r15/<query>_<suffix>.txt (the judge checks
  * before/after plan claims against these files).
  *
  * `sbt 'runMain graft.tools.PlanSnap <suffix> <query> [query ...]'`
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <suffix> <query> [query ...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // PLANSNAP_EXEC=1: run the query before dumping so the file carries
    // the AQE FINAL plan (isFinalPlan=true) — runtime rewrites like
    // SMJ->SHJ under maxShuffledHashJoinLocalMapThreshold and coalesced
    // AQEShuffleReads are invisible in the initial plan.
    val exec = sys.env.get("PLANSNAP_EXEC").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val plansDir = sys.env.getOrElse("GRAFT_PLANS_DIR", "plans/r16")
    Files.createDirectories(Paths.get(plansDir))
    val qs = SparkEntry.queries
    names.foreach { n =>
      qs.get(n) match {
        case Some(fn) =>
          val qe = fn(spark, sfDir).queryExecution
          if (exec) qe.toRdd.count()
          val plan = qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"${plansDir}/${n}_$suffix.txt"), plan)
          println(s"[plansnap] wrote ${plansDir}/${n}_$suffix.txt")
        case None => System.err.println(s"[plansnap] unknown query: $n")
      }
    }
    spark.stop()
  }
}
