package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build an N× key-offset replica of a fixture directory for
  * the empirical scaling proof (SCALE.md). TPC-H semantics: dimension
  * tables stay FIXED, fact/doc/event tables replicate with per-copy key
  * offsets so join fan-outs stay constant per row and group-by keyspaces
  * scale linearly:
  *   - orders/lineitem: orderkey += copy·1e9 (custkey/partkey untouched
  *     → same dim-join density per copy)
  *   - documents: doc_id += copy·1e6 and the text gets a per-copy tag
  *     token, so near-dup/shingle pair density scales linearly instead
  *     of quadratically across copies
  *   - embeddings: vec_id += copy·1e6 (vectors unchanged — candidate
  *     density per LSH/IVF cell scales linearly)
  *   - events: event_id += copy·1e9, user_id += copy·1e6 (more users at
  *     the same per-user event density; ts stays nanosecond-precision —
  *     read as long under nanosAsLong, written back as int64)
  *
  * Usage: runMain graft.tools.ReplicateSf <srcDir> <outDir> [copies]
  */
object ReplicateSf {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dimensions: fixed, byte-identical semantics
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => wr(rd(t), t))

    def replicate(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = rd(name)
      wr((0 until copies).map(c => f(base, c)).reduce(_ unionAll _), name)
    }
    replicate("orders") { (df, c) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(c.toLong * 1000000000L))
    }
    replicate("lineitem") { (df, c) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(c.toLong * 1000000000L))
    }
    replicate("documents") { (df, c) =>
      // tag EVERY word per copy: shingles/chunks then never match across
      // copies, so near-dup pair density scales linearly with copies —
      // a single appended tag token would leave cross-copy shingle sets
      // intact and the self-join pair count quadratic in copies
      df.withColumn("doc_id", col("doc_id") + lit(c.toLong * 1000000L))
        .withColumn("text",
          if (c == 0) col("text")
          else array_join(expr(s"transform(split(text, ' '), w -> concat(w, 'x$c'))"), " "))
    }
    replicate("embeddings") { (df, c) =>
      df.withColumn("vec_id", col("vec_id") + lit(c.toLong * 1000000L))
    }
    replicate("events") { (df, c) =>
      df.withColumn("event_id", col("event_id") + lit(c.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(c.toLong * 1000000L))
    }
    println(s"replicated $src -> $out x$copies")
    spark.stop()
  }
}
