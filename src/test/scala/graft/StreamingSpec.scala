package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ≡ batch: the Structured Streaming realizations produce
  * the same results as the batch operators when the whole table is
  * replayed through the streaming engine.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming tumbling window equals batch tumbling window") {
    val q = EventStreams.tumblingCounts(EventStreams.source(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling_out")
      .select("hour_start", "event_type", "n", "total")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("j_tumbling_window")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming heavy hitters: sharded MG summaries merge to exact batch counts") {
    val q = EventStreams.heavyHitterShards(spark, sf)
      .toDF("shard", "summary")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    // shards partition the vocabulary and each shard stays under k
    // entries, so flattening the summaries IS the exact global count
    val streamed = spark.table("hh_out")
      .select(explode(col("summary")).as("e"))
      .select(col("e._1").as("w"), col("e._2").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = T(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("streaming priority sample: shard top-k summaries reproduce the batch sample") {
    val q = EventStreams.prioritySampleShards(spark, sf)
      .toDF("shard", "summary")
      .writeStream.outputMode("complete")
      .format("memory").queryName("ps_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    // flatten shard summaries and re-select global top-20 by
    // (priority desc, doc_id asc) — exact because a global top-k
    // member is always in its shard's top-k
    val streamed = spark.table("ps_out")
      .select(explode(col("summary")).as("e"))
      .select(col("e._2").as("doc_id"), col("e._1").as("priority"))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = SparkEntry.queries("n_priority_sample")(spark, sf)
      .select("doc_id", "priority")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(streamed == batch)
  }

  test("streaming k-NN retrieval: drained probe feed equals the batch join") {
    val q = EventStreams.knnStream(spark, sf)
      .toDF("qid", "summary")
      .writeStream.outputMode("complete")
      .format("memory").queryName("knn_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("knn_out")
      .select(col("qid"), posexplode(col("summary")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rk"),
        col("col._2").as("vec_id"), col("col._1").as("sim"))
      .orderBy(col("qid"), col("rk"))
      .collect().toSeq
    val batch = SparkEntry.queries("n_knn_join_topk")(spark, sf)
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming BM25 retrieval: drained query feed equals the batch ranking") {
    import org.apache.spark.sql.expressions.Window
    val q = EventStreams.bm25Stream(spark, sf)
      .toDF("qid", "summary")
      .writeStream.outputMode("complete")
      .format("memory").queryName("bm25_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bm25_out")
      .select(col("qid"), posexplode(col("summary")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rk"),
        col("col._2").as("doc_id"), col("col._1").as("score"))
      .orderBy(col("qid"), col("rk"))
      .collect().toSeq
    // batch twin: the identical index, score fold, and tie-break
    val index = EventStreams.bm25Index(spark, sf)
    val queries = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 50 === 1)
      .select(col("doc_id").as("qid"),
        array_distinct(filter(split(col("text"), " "), w => length(w) > 0)).as("qterms"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc_nulls_last, col("doc_id").asc_nulls_last)
    val batch = queries.join(broadcast(index), col("doc_id") =!= col("qid"))
      .withColumn("score", EventStreams.bm25Score)
      .filter(col("score") > 0.0)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select(col("qid"), col("rk").cast("int").as("rk"), col("doc_id"), col("score"))
      .orderBy(col("qid"), col("rk"))
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming fuzzy dedup-on-arrival equals the batch blocking on the arrival subset") {
    val q = EventStreams.fuzzyMatchStream(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("fuzzy_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("fuzzy_out")
      .orderBy(col("aid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // batch twin: the same deletion-key blocking + verify, batch-side
    val hist = EventStreams.fuzzyDeletionKeys(
      spark.read.parquet(s"$sf/customer.parquet")
        .select(col("c_custkey").as("hid"), col("c_name").as("hname")),
      "hid", "hname")
    val arrivals = EventStreams.fuzzyDeletionKeys(
      spark.read.parquet(s"$sf/customer.parquet")
        .filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("aid"), col("c_name").as("aname")),
      "aid", "aname")
    val batch = arrivals.join(hist, "k")
      .filter(col("aid") =!= col("hid") &&
        levenshtein(col("aname"), col("hname")) <= 1)
      .groupBy(col("aid"))
      .agg(size(collect_set(col("hid"))).as("n_matches"),
        min(col("hid")).as("best_match"))
      .orderBy(col("aid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // every arrival with a distance-1 neighbor in the full batch join
    // must surface here too (subset consistency with n_fuzzy_join_edit1)
    val pairs = SparkEntry.queries("n_fuzzy_join_edit1")(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
    val expectIds = pairs.filter(_._1 % 7 == 0).map(_._1).toSet
    assert(streamed.map(_._1).toSet == expectIds)
  }

  test("streaming dedup: duplicated stream collapses back to distinct events") {
    // duplicate every event by unioning the source with itself
    val doubled = EventStreams.source(spark, sf).union(EventStreams.source(spark, sf))
    val q = EventStreams.dedupe(doubled)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_out").count()
    val distinctIds = T(spark, sf, "events").select("event_id").distinct().count()
    assert(streamed == distinctIds, s"streamed=$streamed distinct=$distinctIds")
  }

  test("streaming ingestion filter: quality gate + dedup-on-arrival equals batch") {
    import org.apache.spark.sql.functions._
    // double the feed: every surviving digest must still appear ONCE
    val doubled = EventStreams.ingestFilter(
      EventStreams.docSource(spark, sf).union(EventStreams.docSource(spark, sf)))
    val q = doubled
      .writeStream.outputMode("append")
      .format("memory").queryName("ingest_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ingest_out").select("digest").distinct().count()
    val streamedRows = spark.table("ingest_out").count()
    val batch = T(spark, sf, "documents")
      .select(trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("t"))
      .filter(length(col("t")) >= 100 && size(split(col("t"), " ")) >= 20)
      .select(md5(col("t"))).distinct().count()
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamedRows == streamed, s"rows=$streamedRows distinct=$streamed (dups survived)")
  }

  test("streaming Gopher battery: stateless row-local rules equal the batch query on every doc") {
    val q = EventStreams.gopherFilterStream(EventStreams.docSource(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("gopher_out")
    val batch = SparkEntry.queries("n_gopher_rules")(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream and batch verdicts diverge")
  }

  test("streaming as-of enrichment equals the batch AsOfJoin") {
    val q = EventStreams.asOfEnrich(spark, EventStreams.source(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("asof_out")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    val ev = T(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val batch = graft.operators.AsOfJoin(clicks, purchases, "user_id", "ts", "ts",
        Map("value" -> "last_purchase_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("stream-stream interval join equals the batch interval join") {
    val q = EventStreams.clickPurchaseJoin(EventStreams.source(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssjoin_out").collect().map(_.toSeq).toSet
    val ev = T(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value"))
    val batch = clicks.join(purchases,
        col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"), col("value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("stateful sessionization: closed+open sessions equal batch session count") {
    import spark.implicits._
    val ds = EventStreams.sessionize(spark, EventStreams.source(spark, sf))
    val q = ds.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val closed = spark.table("sessions_out").count()
    // batch truth: total sessions over all users
    val batchSessions = SparkEntry.queries("j_sessionization")(spark, sf)
      .count() // user_id < 40 filter applies
    val closedU40 = spark.table("sessions_out")
      .filter(col("user_id") < 40).count()
    // one whole-table replay = one micro-batch: every session except the
    // final open one per user is emitted; open tails stay in state
    val openTails = T(spark, sf, "events").filter(col("user_id") < 40)
      .select(col("user_id")).distinct().count()
    assert(closedU40 + openTails == batchSessions,
      s"closed=$closedU40 open=$openTails batch=$batchSessions")
  }

  test("streaming HLL: merged shard register files reproduce the batch estimate exactly") {
    val q = EventStreams.hllShards(spark, sf)
      .toDF("shard", "regs")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val shardRegs = spark.table("hll_out")
      .collect().map(_.getSeq[Int](1)).toSeq
    // shard state bound: each register file is exactly 64 ints
    assert(shardRegs.forall(_.length == 64))
    val merged = shardRegs.foldLeft(graft.operators.HllSketch().zero)(
      graft.operators.HllSketch().merge)
    val streamedEst = graft.operators.HllSketch.estimate(merged)
    val batchRow = SparkEntry.queries("n_hll_distinct")(spark, sf).collect().head
    // the batch query rounds to 4 decimals (Spark round = HALF_UP);
    // the register files are identical so the estimates agree exactly
    val rounded = BigDecimal(streamedEst)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rounded == batchRow.getDouble(2),
      s"stream est $streamedEst != batch est ${batchRow.getDouble(2)}")
  }

  test("streaming bottom-k sample: merged shards reproduce the batch quantile sketch exactly") {
    val q = EventStreams.sampleShards(spark, sf)
      .toDF("shard", "sample")
      .writeStream.outputMode("complete")
      .format("memory").queryName("qsk_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val sk = graft.operators.SampleSketch(256)
    val shardSamples = spark.table("qsk_out")
      .collect().map(_.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getDouble(1))))
    assert(shardSamples.forall(_.length <= 256))
    val merged = shardSamples.foldLeft(sk.zero)(sk.merge)
    val batch = SparkEntry.queries("n_quantile_sketch")(spark, sf)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    batch.foreach { case (p, est) =>
      val streamed = graft.operators.SampleSketch.quantile(merged, p)
      val rounded = BigDecimal(streamed)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rounded == est, s"p=$p stream $streamed != batch $est")
    }
  }

  test("streaming KMV: merged shard sketches reproduce the batch estimate exactly") {
    val q = EventStreams.kmvShards(spark, sf)
      .toDF("shard", "sketch")
      .writeStream.outputMode("complete")
      .format("memory").queryName("kmv_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val shardSketches = spark.table("kmv_out")
      .collect().map(_.getSeq[Long](1)).toSeq
    // shard state bound: each sketch holds at most k distinct hashes
    assert(shardSketches.forall(s0 => s0.length <= 64 && s0 == s0.distinct.sorted))
    val merged = shardSketches.foldLeft(Seq.empty[Long])(
      graft.operators.KmvSketch(64).merge)
    val streamedEst = graft.operators.KmvSketch.estimate(merged, 64)
    val batchRow = SparkEntry.queries("n_kmv_distinct")(spark, sf).collect().head
    assert(math.abs(streamedEst - batchRow.getDouble(2)) < 1e-3,
      s"stream est $streamedEst != batch est ${batchRow.getDouble(2)}")
  }

  test("streaming winnowing screen: row-local fingerprints equal the windowed batch relation; matches equal the batch join") {
    // the row-local fused expression must reproduce the batch window
    // formulation doc for doc
    val rowLocal = T(spark, sf, "documents")
      .select(col("doc_id"),
        explode(graft.queries.Round10Queries.winnowFpArray(
          filter(split(col("text"), " "), w => length(w) > 0))).as("fph"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val windowed = graft.queries.Round10Queries.winnowFingerprints(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rowLocal == windowed,
      "row-local winnowing must equal the windowed batch relation")
    // drained stream equals the batch fingerprint join on arrivals
    val q = EventStreams.winnowScreenStream(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("winnow_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("winnow_out")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val fp = graft.queries.Round10Queries.winnowFingerprints(spark, sf)
    val batch = fp.filter(col("doc_id") % 37 === 2).as("a")
      .join(fp.filter(col("doc_id") % 37 =!= 2).as("b"), col("a.fph") === col("b.fph"))
      .select(col("a.doc_id").as("arr"), col("b.doc_id").as("hist"))
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size} arrivals")
    assert(streamed.nonEmpty, "fixture must produce at least one near-dup arrival")
  }

  test("streaming trending: drained per-key counters rank like the batch top-10") {
    val q = EventStreams.trendingStream(spark, sf)
      .toDF("user_id", "counter")
      .writeStream.outputMode("complete")
      .format("memory").queryName("trend_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val tmax = T(spark, sf, "events")
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    val h = 86400000000.0
    val streamed = spark.table("trend_out")
      .collect().map { r =>
        val (s0, asOf) = (r.getStruct(1).getDouble(0), r.getStruct(1).getLong(1))
        r.getLong(0) -> s0 * math.pow(2.0, -(tmax - asOf).toDouble / h)
      }.sortBy { case (uid, sc) => (-sc, uid) }.take(10)
    val batch = SparkEntry.queries("n_trending")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(streamed.map(_._1).toSeq == batch.map(_._1).toSeq,
      s"stream ranking ${streamed.map(_._1).toSeq} != batch ${batch.map(_._1).toSeq}")
    streamed.zip(batch).foreach { case ((_, ss), (_, bs)) =>
      assert(math.abs(ss - bs) / math.max(bs, 1e-12) < 1e-6,
        s"stream score $ss != batch $bs")
    }
  }

  test("streaming CMS shards sum cellwise to the exact batch sketch") {
    val q = EventStreams.cmsShards(spark, sf)
      .toDF("shard", "cells")
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val sketches = spark.table("cms_out")
      .collect().map(_.getSeq[Long](1).toArray).toSeq
    assert(sketches.forall(_.length == 4 * 256))
    val merged = sketches.reduce(graft.operators.CmsSketch().merge)
    // batch reference: the same (row, col)-keyed sum the oracle checks
    val batch = T(spark, sf, "documents")
      .select(explode(filter(split(col("text"), " "), w => length(w) > 0)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("tok"), col("cnt"),
        explode(array((0 until 4).map(lit): _*)).as("i"))
      .withColumn("c",
        conv(substring(md5(concat(lit("graft-cms-"), col("i").cast("string"),
          lit(":"), col("tok"))), 1, 13), 16, 10).cast("bigint") % 256)
      .groupBy("i", "c").agg(sum(col("cnt")).as("total"))
      .collect().map(r => (r.getInt(0) * 256 + r.getLong(1).toInt) -> r.getLong(2)).toMap
    val batchCells = new Array[Long](4 * 256)
    batch.foreach { case (idx, v) => batchCells(idx) = v }
    assert(merged.toSeq == batchCells.toSeq,
      "drained stream sketch must equal the batch sketch cell for cell")
    // point estimates agree with true counts' one-sided guarantee
    val top = T(spark, sf, "documents")
      .select(explode(filter(split(col("text"), " "), w => length(w) > 0)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    top.foreach { case (tok, cnt) =>
      assert(graft.operators.CmsSketch.estimate(merged, tok) >= cnt)
    }
  }

  test("streaming half-life counters match the batch decayed counts after rescale") {
    val q = EventStreams.decayedCounters(spark, sf)
      .toDF("event_type", "counter")
      .writeStream.outputMode("complete")
      .format("memory").queryName("decay_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("decay_out")
      .select(col("event_type"), col("counter._1").as("sum"), col("counter._2").as("asOf"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val tmax = T(spark, sf, "events")
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    val h = 604800000000.0
    // batch reference: direct single-pass decayed count per type
    val batch = T(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(sum(pow(lit(2.0), -(lit(tmax) - unix_micros(col("ts"))).cast("double") / h))
        .as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, (s0, asOf)) =>
      val rescaled = s0 * math.pow(2.0, -(tmax - asOf).toDouble / h)
      val b = batch(k)
      assert(math.abs(rescaled - b) / b < 1e-9,
        s"$k: streamed counter $rescaled != batch $b — rescaling law broken")
    }
  }

  test("streaming encoding audit: per-doc rows roll up to the exact batch report") {
    val q = EventStreams.encodingAuditStream(EventStreams.docSource(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("encaudit_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("encaudit_out")
      .groupBy(col("source")).agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("affected")).cast("bigint").as("n_affected"),
        sum(col("n_repl")).cast("bigint").as("repl_chars"),
        sum(col("n_moji")).cast("bigint").as("moji_chars"),
        sum(col("n_nbsp")).cast("bigint").as("nbsp_chars"),
        sum(col("n_ctrl")).cast("bigint").as("ctrl_chars"))
    val batch = SparkEntry.queries("n_encoding_audit")(spark, sf)
      .select("source", "n_docs", "n_affected", "repl_chars", "moji_chars",
        "nbsp_chars", "ctrl_chars")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed rollup diverges from the batch audit")
  }

  test("streaming kappa shards: summed confusion counters reproduce batch kappa exactly") {
    val q = EventStreams.kappaShards(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("kappa_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val shards = spark.table("kappa_out").collect()
    assert(shards.length > 1, "fixture should fill multiple shards")
    val Seq(n11, n10, n01, n00) = (1 to 4).map(i => shards.map(_.getLong(i)).sum)
    val b = SparkEntry.queries("n_kappa_agreement")(spark, sf).collect().head
    assert((n11, n10, n01, n00) ==
      ((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4))),
      "merged confusion matrix != batch")
    val n = (n11 + n10 + n01 + n00).toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    val kappa = BigDecimal((po - pe) / (1 - pe))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(kappa == b.getDouble(7), s"streamed kappa $kappa != batch ${b.getDouble(7)}")
  }

  test("streaming turn structure: incremental run tracking equals the batch islands") {
    val q = EventStreams.turnStructureStream(spark, EventStreams.source(spark, sf))
      .writeStream.outputMode("update")
      .format("memory").queryName("turns_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    // one micro-batch over the parquet replay -> one summary per key
    val streamed = spark.table("turns_out")
      .select(col("user_id"), col("n_events"), col("n_turns"),
        col("max_user_run"), col("max_assistant_run"), col("opens_with"),
        col("closes_with"), col("strict_alternation"))
    val batch = SparkEntry.queries("n_turn_structure")(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed turn summaries diverge from the batch query")
  }
  test("streaming transfer shards: summed (source, token) counts equal the batch relation") {
    val q = EventStreams.transferShards(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("transfer_shards_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val merged = spark.table("transfer_shards_out")
      .groupBy(col("source"), col("w")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(spark.table("transfer_shards_out")
      .select(countDistinct(col("shard"))).collect().head.getLong(0) > 1,
      "fixture should fill multiple shards")
    val batch = T(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(merged == batch,
      "merged transfer shards diverge from the batch (source, token) relation")
  }

  test("streaming ANN decontamination screen: drained rollup equals the batch candidates") {
    val q = EventStreams.annScreenStream(spark, sf)
      .writeStream.outputMode("append")
      .format("memory").queryName("ann_screen_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ann_screen_out")
      .groupBy(col("bid"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(col("contaminated")).cast("int").as("n_contaminated"),
        max(col("sim")).as("max_sim"))
      .orderBy(col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val batch = SparkEntry.queries("n_decontam_semantic_ann")(spark, sf)
      .filter(col("n_candidates") > 0)
      .select("bid", "n_candidates", "n_contaminated", "max_sim")
      .orderBy(col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
