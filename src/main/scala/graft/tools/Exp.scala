package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, T}

/** Scratch experiments for the round-15 optimization pass (not part of
  * the driver contract; timings guide which rewrites to keep).
  */
object Exp {
  def time(name: String, k: Int)(f: => DataFrame): Unit = {
    val times = (1 to k).map { _ =>
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[exp] $name%-40s min=${times.min}%8.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    T.all.foreach { t => try T(spark, sfDir, t).queryExecution.toRdd.count() catch { case _: Throwable => } }

    val li = T(spark, sfDir, "lineitem")
    // 1. raw single-task decode cost of the q1 columns
    time("q1 scan-only (7 cols, pushed filter)", 3) {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_returnflag"), col("l_linestatus"))
    }
    // 2. q1 as-is (single-task partial agg)
    time("q1 as-is", 3)(graft.queries.CoreQueries.q1(spark, sfDir))
    // 3. q1 with a repartition before the agg
    time("q1 repartitioned", 3) {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_returnflag"), col("l_linestatus"))
        .repartition(spark.sparkContext.defaultParallelism)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          graft.Exact.sumExact(col("l_quantity")).as("sum_qty"),
          graft.Exact.sumExact(col("l_extendedprice")).as("sum_base_price"),
          graft.Exact.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          graft.Exact.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          graft.Exact.avgExact(col("l_quantity")).as("avg_qty"),
          graft.Exact.avgExact(col("l_extendedprice")).as("avg_price"),
          graft.Exact.avgExact(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
    }
    // 4. documents token explode: as-is vs repartitioned
    val docs = T(spark, sfDir, "documents")
    time("docs md5-chunk explode as-is", 3) {
      docs.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, cast(ceil(size(split(text, ' ')) / 3.0) as int) - 1), c -> array_join(slice(split(text, ' '), c * 3 + 1, 3), ' '))")))
        .toDF("doc_id", "cidx", "chunk")
        .select(col("doc_id"), md5(col("chunk")).as("dg"))
        .groupBy("dg").agg(min("doc_id").as("f"))
    }
    time("docs md5-chunk explode repart", 3) {
      docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, cast(ceil(size(split(text, ' ')) / 3.0) as int) - 1), c -> array_join(slice(split(text, ' '), c * 3 + 1, 3), ' '))")))
        .toDF("doc_id", "cidx", "chunk")
        .select(col("doc_id"), md5(col("chunk")).as("dg"))
        .groupBy("dg").agg(min("doc_id").as("f"))
    }
    // 5. embeddings cosine: interpreted HOF vs native, 1-task vs repart
    val emb = T(spark, sfDir, "embeddings").select(col("vec_id"), col("label"), col("embedding"))
    val probes = emb.filter(col("vec_id") % 50 === 0).orderBy(col("vec_id")).limit(200)
      .select(col("vec_id").as("qid"), col("label").as("own"), col("embedding").as("qv"))
    time("cosine HOF as-is (1-task)", 3) {
      emb.join(broadcast(probes), col("vec_id") =!= col("qid"))
        .withColumn("simr", round(graft.queries.SimilarityQueries.cosineHof("qv", "embedding"), 6))
        .groupBy("qid").agg(max("simr"))
    }
    time("cosine native repart", 3) {
      emb.repartition(spark.sparkContext.defaultParallelism)
        .join(broadcast(probes), col("vec_id") =!= col("qid"))
        .withColumn("simr", round(graft.queries.SimilarityQueries.cosine("qv", "embedding"), 6))
        .groupBy("qid").agg(max("simr"))
    }
    // --- audio codec profiling (m_audio_features = 3.8 s at sf0.1) ---
    val ids = T(spark, sfDir, "documents").select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
    time("audio synth only (UDF)", 3) {
      ids.select(col("doc_id"),
          length(graft.operators.AudioDecode.synthWavUdf(col("doc_id"))).as("n"))
        .agg(sum("n"))
    }
    time("audio synth+decode (current op)", 3) {
      graft.operators.AudioDecode.extractFeatures(
        ids.select(col("doc_id"),
          graft.operators.AudioDecode.synthWavUdf(col("doc_id")).as("payload")))
    }
    // single-threaded JVM cost of the two halves, outside Spark
    val t0 = System.nanoTime()
    var bytes = 0L
    (0 until 5000).foreach { i => bytes += graft.operators.AudioDecode.synthWav(i.toLong).length }
    val t1 = System.nanoTime()
    (0 until 5000).foreach { i =>
      val p = graft.operators.AudioDecode.synthWav(i.toLong)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      bytes += ais.readAllBytes().length; ais.close()
    }
    val t2 = System.nanoTime()
    println(f"[exp] jvm-1thread synth 5000: ${(t1-t0)/1e9}%.3f s; synth+decode: ${(t2-t1)/1e9}%.3f s (bytes=$bytes)")
    // 32-thread contention probe on AudioSystem
    val t3 = System.nanoTime()
    val threads = (0 until 32).map { t =>
      new Thread(() => {
        var b = 0L
        ((t * 157) until ((t + 1) * 157)).foreach { i =>
          val p = graft.operators.AudioDecode.synthWav(i.toLong)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(p))
          b += ais.readAllBytes().length; ais.close()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val t4 = System.nanoTime()
    println(f"[exp] jvm-32thread synth+decode 5024: ${(t4-t3)/1e9}%.3f s")
    spark.stop()
  }
}
