package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry, T}

/** Round-start fixture-drift smoke check (round-8 verdict #8).
  *
  * Round 7 was lost because the driver regenerated `events.parquet` in a
  * different physical shape (TIMESTAMP(NANOS) → ns-as-long) and the first
  * signal was a failed bench at round end. This main makes regeneration a
  * minutes-not-rounds discovery: it prints every fixture table's raw
  * parquet schema (pre-normalization), then actually EXECUTES the
  * flagship `entry` plus one events query and one documents query against
  * the CURRENT testdata, and writes a one-line JSON report to
  * target/smoke_shapes.json. Run it at the top of every round:
  *
  *   sbt "runMain graft.tools.SmokeShapes"          # defaults to sf0.001
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.tools.SmokeShapes"
  *
  * Exit code is nonzero when any probe fails, so it can gate a round
  * script. The schema dump is the diagnostic payload: when a probe DOES
  * fail, the drifted column is already named in the same line.
  */
object SmokeShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

    // Raw physical schemas, read WITHOUT the T-layer normalization —
    // this is the layer where drift happens (T.normalizeEventTs only
    // repairs the shapes it knows about).
    val shapes = T.all.map { t =>
      val s =
        try spark.read.parquet(s"$sfDir/$t.parquet").schema
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        catch { case e: Throwable => s"UNREADABLE(${e.getClass.getSimpleName})" }
      s""""$t":"${esc(s)}""""
    }

    // Execution probes: flagship + the two tables the driver has
    // historically regenerated with new shapes (events, documents).
    val probes = Seq(
      "entry" -> (() => SparkEntry.entry(spark).count()),
      "j_tumbling_window" -> (() =>
        SparkEntry.queries("j_tumbling_window")(spark, sfDir)
          .queryExecution.toRdd.count()),
      "n_text_stats" -> (() =>
        SparkEntry.queries("n_text_stats")(spark, sfDir)
          .queryExecution.toRdd.count()),
      "n_cosine_topk_bruteforce" -> (() =>
        SparkEntry.queries("n_cosine_topk_bruteforce")(spark, sfDir)
          .queryExecution.toRdd.count()))
    val results = probes.map { case (name, run) =>
      val r =
        try { val n = run(); s""""rows":$n""" }
        catch { case e: Throwable => s""""error":"${esc(e.getMessage.take(200))}"""" }
      s""""$name":{$r}"""
    }
    val ok = !results.exists(_.contains("\"error\""))

    val line =
      s"""{"ok":$ok,"sf":"$sfDir","probes":{${results.mkString(",")}},""" +
        s""""shapes":{${shapes.mkString(",")}}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/smoke_shapes.json"), line)
    catch { case _: Throwable => }
    println(line)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
