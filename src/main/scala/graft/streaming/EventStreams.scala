package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming realization of the event-time operators
  * (tumbling windows, stateful sessionization).
  *
  * The reference has no streaming plane (SURVEY.md §2.2 J — its
  * "streaming" is chunked HTTP transport), so these are not part of
  * the oracle-checked parity surface; they are the Spark-native scale
  * path for the same semantics, spec-tested against the batch
  * implementations in StreamingSpec (memory sink +
  * processAllAvailable drives a parquet directory through the
  * streaming engine synchronously).
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionState(sessionStart: Long, lastUs: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long)

  /** Streaming source over the events table: the ns→µs-normalized
    * parquet is re-read through readStream with an explicit schema
    * (streaming scans cannot infer).
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.tune(spark)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet") // basePath must be a dir
      .parquet(dir)
    // Same dual-shape ts normalization as the batch loader (graft.T).
    graft.T.normalizeEventTs(stream)
  }

  /** Tumbling 1-hour windowed counts with a 1-hour watermark —
    * identical semantics to the batch j_tumbling_window query.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total"))

  /** Stateful 30-min-gap sessionization via flatMapGroupsWithState —
    * the custom-state scale path (KeyValueGroupedDataset, SURVEY §2.2 K).
    * Emits CLOSED sessions only; each key's trailing open session stays
    * in state (NoTimeout — a production deployment would use an
    * event-time timeout to flush tails; StreamingSpec accounts for the
    * open tails explicitly when proving equivalence to batch).
    */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    // full-µs precision: Timestamp.getTime is ms-truncated
    def usOf(e: Event): Long =
      Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // batch-drain: events arrive unordered within the trigger, so
          // sort the micro-batch; across triggers state carries the tail
          val sorted = rows.toSeq.sortBy(e => (usOf(e), e.event_id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            val us = usOf(e)
            if (st == null) st = SessionState(us, us, 1L)
            else if (us - st.lastUs > gapUs) {
              out += SessionOut(userId, st.sessionStart, st.n)
              st = SessionState(us, us, 1L)
            } else st = st.copy(lastUs = us, n = st.n + 1)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Stream-stream interval join: each click enriched with the same
    * user's purchases in the following hour. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * the engine can prune join state — the property that keeps a
    * stream-stream join runnable forever on an unbounded feed.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("value"))
  }

  final case class AsOfState(lastUs: Long, value: Double)
  final case class EnrichedClick(user_id: Long, event_id: Long,
      last_purchase_value: Option[Double])

  /** Streaming AS-OF enrichment — the unbounded-feed face of
    * [[graft.operators.AsOfJoin]]: every click is emitted with the
    * same user's most recent purchase value at-or-before it. State is
    * ONE (timestamp, value) pair per user — O(keys) forever,
    * regardless of stream length — because an as-of probe only ever
    * needs the latest reference row, never a buffer. Within a
    * micro-batch events are sorted by (time, purchase-before-click,
    * id), reproducing the batch operator's inclusive >= tie order;
    * across micro-batches the state carries the running latest.
    * StreamingSpec proves ≡ batch AsOfJoin on the full replay.
    */
  def asOfEnrich(spark: SparkSession, events: DataFrame): Dataset[EnrichedClick] = {
    import spark.implicits._
    def usOf(e: Event): Long =
      Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
    events.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, EnrichedClick](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[AsOfState]) =>
          val sorted = rows.toSeq.sortBy(e =>
            (usOf(e), if (e.event_type == "purchase") 0 else 1, e.event_id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[EnrichedClick]()
          sorted.foreach { e =>
            if (e.event_type == "purchase") st = AsOfState(usOf(e), e.value)
            else out += EnrichedClick(userId, e.event_id, Option(st).map(_.value))
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Streaming exact dedup: drop duplicate event_ids within a
    * watermark window — the streaming face of the n_dedup_exact
    * north-star (state is bounded by the watermark horizon, which is
    * what makes exact dedup feasible on an unbounded 100 TB/day
    * stream).
    */
  def dedupe(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming heavy hitters: the Misra-Gries Aggregator
    * ([[graft.operators.HeavyHitters]]) run as a SHARDED streaming
    * aggregation — words hash into `shards` groups, each group keeps a
    * bounded k-entry summary in streaming state, and shard summaries
    * merge exactly at read-out (MG summaries are mergeable, and shards
    * partition the vocabulary, so the union IS the global sketch).
    * This is the unbounded-feed face of n_heavy_hitters: state is
    * O(shards × k) forever, regardless of stream length.
    */
  def heavyHitterShards(spark: SparkSession, dir: String,
      shards: Int = 16, k: Int = 64): Dataset[(Int, Seq[(String, Long)])] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val hh = new graft.operators.HeavyHitters(k, k)
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .select(explode(split(col("text"), " ")).as("w")).as[String]
      .groupByKey(w => math.floorMod(w.hashCode, shards))
      .agg(hh.toColumn.name("summary"))
  }

  /** Streaming weighted top-k — the unbounded-feed face of
    * n_priority_sample: documents arrive as a stream, each gets the
    * SAME seeded priority w/u (Round8Queries.priorityExpr), and
    * per-shard [[graft.operators.TopKByScore]] summaries maintain at
    * most shards×k entries of state. Exact, not approximate: a global
    * top-k member is always in its shard's top-k, so flattening shard
    * summaries and re-selecting k reproduces the batch sample
    * bit-for-bit (StreamingSpec proves it).
    */
  def prioritySampleShards(spark: SparkSession, dir: String,
      shards: Int = 8, k: Int = 20): Dataset[(Long, Seq[(Double, Long)])] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val topk = graft.operators.TopKByScore(k)
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .select(col("doc_id"), graft.queries.Round8Queries.priorityExpr.as("priority"))
      .select(col("priority"), col("doc_id")).as[(Double, Long)]
      .groupByKey { case (_, id) => math.floorMod(id, shards.toLong) }
      .agg(topk.toColumn.name("summary"))
  }

  /** Streaming BM25 retrieval — the unbounded-feed face of
    * n_bm25_topk: QUERIES arrive as a stream (each query = a document's
    * distinct term set) while the scored inverted index stays static.
    * The index is built ONCE batch-side — per doc, a term → BM25
    * contribution map (the contribution depends only on doc statistics,
    * never on the query, so it fully precomputes) — and broadcast; each
    * micro-batch scores its queries with one row-local fold over the
    * query terms (map lookups, zero per-candidate aggregation), and the
    * per-query [[graft.operators.TopKByScore]] aggregate holds exactly
    * k entries per query seen: state O(queries × k), independent of
    * corpus size and feed length. At cluster scale the static side
    * would partition by term with a per-(query, doc) pre-aggregate
    * instead of broadcasting; the top-k reduction shape is unchanged.
    * StreamingSpec proves the drained stream equals the identically-
    * formulated batch ranking row for row.
    */
  def bm25Stream(spark: SparkSession, dir: String, k: Int = 10)
      : Dataset[(Long, Seq[(Double, Long)])] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val index = bm25Index(spark, dir)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val topk = graft.operators.TopKByScore(k)
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter(col("doc_id") % 50 === 1)
      .select(col("doc_id").as("qid"),
        array_distinct(filter(split(col("text"), " "), w => length(w) > 0)).as("qterms"))
      .join(broadcast(index), col("doc_id") =!= col("qid"))
      .withColumn("score", bm25Score)
      .filter(col("score") > 0.0)
      .select(col("qid"), col("score"), col("doc_id")).as[(Long, Double, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(topk.toColumn.name("summary"))
  }

  /** The scored inverted index behind [[bm25Stream]]: per doc, a term →
    * rounded BM25 contribution map (k1 = 1.2, b = 0.75 — the
    * n_bm25_topk constants). Shared by the spec's batch twin.
    */
  def bm25Index(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => length(w) > 0).as("words"))
      .withColumn("dl", size(col("words")))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("words")).as("w"))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "w").crossJoin(broadcast(stats))
      .withColumn("idf",
        round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 8))
      .withColumn("contrib", round(
        col("idf") * (col("tf").cast("double") * 2.2)
          / (col("tf").cast("double")
            + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))), 8))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("contrib")))).as("cmap"))
  }

  /** Row-local BM25 score: fold the query's terms over the doc's
    * contribution map — identical evaluation on stream and batch.
    */
  def bm25Score: org.apache.spark.sql.Column =
    // try_element_at, NOT element_at: Spark 4 resolves Column-API
    // functions by name through the session registry, which since the
    // round-15 build carries DuckDB's LIST-valued map element_at
    // (Dialect.scala:1303 convention); try_element_at keeps the
    // builtin value-or-NULL semantics this fold needs.
    round(aggregate(col("qterms"), lit(0.0d),
      (acc, t) => acc + coalesce(try_element_at(col("cmap"), t), lit(0.0d))), 6)

  /** Streaming fuzzy dedup-on-arrival — the unbounded-feed face of
    * n_fuzzy_join_edit1: entities ARRIVE as a stream and match the
    * historical corpus through the static SymSpell deletion-key index
    * (exact at edit distance ≤ 1 — every distance-1 pair shares a
    * key). Each micro-batch explodes arrivals to their deletion keys,
    * stream-static joins against the index (per-batch work, keys are
    * 16-byte digests), verifies with a row-local levenshtein, and the
    * per-arrival aggregate folds candidates into a match set — state
    * O(arrivals), independent of corpus size. collect_set, not
    * count(DISTINCT): streaming aggregation supports the former.
    * StreamingSpec proves the drained stream equals the batch blocking
    * restricted to the same arrival subset.
    */
  def fuzzyMatchStream(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.tune(spark)
    val hist = fuzzyDeletionKeys(
      spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("hid"), col("c_name").as("hname")),
      "hid", "hname")
    val schema = spark.read.parquet(s"$dir/customer.parquet").schema
    val arrivals = spark.readStream.schema(schema)
      .option("pathGlobFilter", "customer.parquet").parquet(dir)
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("aid"), col("c_name").as("aname"))
    // dedupe = false: a streaming distinct would be a second stateful
    // operator; duplicate (arrival, hist) candidate rows are collapsed
    // by the collect_set below instead
    fuzzyDeletionKeys(arrivals, "aid", "aname", dedupe = false)
      .join(hist, "k")
      .filter(col("aid") =!= col("hid") &&
        levenshtein(col("aname"), col("hname")) <= 1)
      .groupBy(col("aid"))
      .agg(size(collect_set(col("hid"))).as("n_matches"),
        min(col("hid")).as("best_match"))
  }

  /** The SymSpell depth-1 key relation: each (id, name) row emits the
    * name plus every single-deletion variant as an md5 key. Shared by
    * the static index and the arrival stream (and mirrored by the
    * batch operator n_fuzzy_join_edit1).
    */
  def fuzzyDeletionKeys(df: DataFrame, idCol: String, nameCol: String,
      dedupe: Boolean = true): DataFrame = {
    val keyed = df.select(col(idCol), col(nameCol), explode(expr(
        s"""array_union(array($nameCol),
          transform(sequence(1, length($nameCol)),
            i -> concat(substring($nameCol, 1, i - 1),
                        substring($nameCol, i + 1, length($nameCol) - i))))""")).as("v"))
      .select(col(idCol), col(nameCol), md5(col("v")).as("k"))
    if (dedupe) keyed.distinct() else keyed
  }

  /** Streaming k-NN retrieval — the unbounded-feed face of
    * n_knn_join_topk: probe vectors ARRIVE as a stream while the
    * corpus stays a static relation. Each micro-batch stream-static
    * joins its probes against the broadcast corpus (per-batch work,
    * no join state), and the per-probe [[graft.operators.TopKByScore]]
    * aggregate holds exactly k entries per probe seen — state is
    * O(probes × k), independent of corpus size and feed length.
    * StreamingSpec proves the drained stream equals the batch join
    * row for row.
    */
  def knnStream(spark: SparkSession, dir: String, k: Int = 10)
      : Dataset[(Long, Seq[(Double, Long)])] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val probes = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val topk = graft.operators.TopKByScore(k)
    probes.join(broadcast(corpus), col("vec_id") =!= col("qid"))
      .select(col("qid"),
        round(graft.queries.SimilarityQueries.cosine("qv", "embedding"), 6).as("sim"),
        col("vec_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(topk.toColumn.name("summary"))
  }

  /** Streaming ingestion filter — the unbounded-feed face of the
    * n_e2e_prep_pipeline front half: documents arrive as a stream,
    * normalize (lower + whitespace collapse), pass the quality gate
    * (>=100 chars, >=20 tokens), and drop exact duplicates on the
    * normalized content digest within a processing-time watermark.
    * State is bounded by the watermark horizon — the property that
    * keeps dedup-on-arrival feasible on an unbounded ingest feed;
    * the batch near-dup screen (n_dedup_incremental) handles the
    * fuzzy tier downstream.
    */
  def docSource(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  def ingestFilter(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id"), col("lang"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("t"))
      .filter(length(col("t")) >= 100 && size(split(col("t"), " ")) >= 20)
      .withColumn("ingest_ts", current_timestamp())
      .withColumn("digest", md5(col("t")))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("digest")
      .select(col("doc_id"), col("lang"), col("digest"))
  }

  /** Streaming Gopher rule battery — the unbounded-feed face of
    * n_gopher_rules: every arriving document evaluates the full
    * rule set ROW-LOCALLY (word-count bounds, mean/max word length,
    * stopword floor, TTR floor), so the operator is stateless in
    * streaming terms — no watermark, no store, the shape that runs
    * at any ingest rate. Emits the same per-rule columns + verdict
    * as the batch query (StreamingSpec proves stream ≡ batch on
    * every doc).
    */
  def gopherFilterStream(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => length(w) > 0).as("words"))
      .withColumn("n_words", size(col("words")))
      .withColumn("sum_len", expr("aggregate(words, 0L, (a, w) -> a + length(w))"))
      .withColumn("mean_wlen", round(col("sum_len").cast("double") / col("n_words"), 6))
      .withColumn("max_wlen", expr("aggregate(words, 0, (a, w) -> greatest(a, length(w)))"))
      .withColumn("stop_hits",
        size(array_intersect(array_distinct(col("words")),
          array(Seq("the", "a", "of", "and", "to").map(lit): _*))))
      .withColumn("ttr", round(
        size(array_distinct(col("words"))).cast("double") / col("n_words"), 6))
      .withColumn("pass",
        col("n_words").between(50, 100000) &&
        col("mean_wlen").between(3.0, 10.0) &&
        col("max_wlen") <= 15 &&
        col("stop_hits") >= 2 &&
        col("ttr") >= 0.2)
      .select(col("doc_id"), col("n_words"), col("mean_wlen"), col("max_wlen"),
        col("stop_hits"), col("ttr"), col("pass"))
  }

  /** Streaming KMV cardinality — the unbounded-feed face of
    * n_kmv_distinct: events arrive as a stream, each user hashes to the
    * SAME portable 52-bit value as the batch query
    * (Round10Queries.kmvHash), and per-shard [[graft.operators.KmvSketch]]
    * summaries keep the k smallest distinct hashes — state is
    * shards × k longs however long the feed runs, with NO stateful
    * dropDuplicates in front (the sketch dedups internally). Summaries
    * merge by keeping the k smallest of the distinct union, so
    * flattening shard summaries and re-merging reproduces the batch
    * sketch — and therefore the batch estimate — exactly
    * (StreamingSpec proves it).
    */
  def kmvShards(spark: SparkSession, dir: String,
      shards: Int = 8, k: Int = 64): Dataset[(Long, Seq[Long])] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val kmv = graft.operators.KmvSketch(k)
    source(spark, dir)
      .select(graft.queries.Round10Queries.kmvHash(col("user_id")).as("hv"))
      .as[Long]
      .groupByKey(hv => math.floorMod(hv, shards.toLong))
      .agg(kmv.toColumn.name("sketch"))
  }

  /** Streaming HyperLogLog register shards — the unbounded-feed face
    * of n_hll_distinct: each arriving event hashes to the SAME
    * portable 52-bit value as the batch query
    * (Round11Queries.hllHash) and per-shard
    * [[graft.operators.HllSketch]] buffers keep 64 max-registers —
    * state is shards × 64 ints however long the feed runs, no
    * stateful dropDuplicates needed (MAX is idempotent, the sketch
    * absorbs duplicates by construction). Register files merge by
    * elementwise MAX, so flattening shard summaries reproduces the
    * batch register file — and therefore the batch estimate —
    * EXACTLY (StreamingSpec proves it).
    */
  def hllShards(spark: SparkSession, dir: String,
      shards: Int = 8): Dataset[(Long, Seq[Int])] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val hll = graft.operators.HllSketch()
    source(spark, dir)
      .select(graft.queries.Round11Queries.hllHash(col("user_id")).as("hv"))
      .as[Long]
      .groupByKey(hv => math.floorMod(hv, shards.toLong))
      .agg(hll.toColumn.name("regs"))
  }

  /** Streaming bottom-k sample shards — the unbounded-feed face of
    * n_quantile_sketch: events arrive as a stream, each hashes its
    * event_id to the SAME portable 52-bit value as the batch query,
    * and per-shard [[graft.operators.SampleSketch]] buffers keep the
    * k smallest (hash, value) pairs — a deterministic uniform sample
    * whose shard summaries merge by keeping the k smallest of the
    * union, so the drained, merged sample (and every quantile
    * estimate over it) equals the batch sketch EXACTLY (StreamingSpec
    * proves it). State: shards × k pairs however long the feed runs.
    */
  def sampleShards(spark: SparkSession, dir: String,
      shards: Int = 8, k: Int = 256): Dataset[(Long, Seq[(Long, Double)])] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val sk = graft.operators.SampleSketch(k)
    source(spark, dir)
      .select(
        graft.queries.Round11Queries.qskHash(col("event_id")).as("hv"),
        col("value"))
      .as[(Long, Double)]
      .groupByKey { case (hv, _) => math.floorMod(hv, shards.toLong) }
      .agg(sk.toColumn.name("sample"))
  }

  /** Streaming half-life counters — the unbounded-feed face of
    * n_time_decay_agg: each event type keeps ONE (decayed sum, as-of)
    * pair via [[graft.operators.DecayedCounter]], folding arrivals by
    * the rescaling law so history is never reprocessed — O(1) state
    * per key however long the feed runs. The drained counters rescale
    * to the global max timestamp and match the batch decayed counts
    * (StreamingSpec pins the fp-composition tolerance).
    */
  def decayedCounters(spark: SparkSession, dir: String)
      : Dataset[(String, (Double, Long))] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val ctr = graft.operators.DecayedCounter()
    source(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, t) => (t, 1.0) }
      .agg(ctr.toColumn.name("counter"))
  }

  /** Streaming Count-Min sketch shards — the unbounded-feed face of
    * n_cms_freq: document tokens stream through per-shard
    * [[graft.operators.CmsSketch]] buffers (d·w longs each — 8 KiB of
    * state per shard however long the feed runs), and because CMS
    * merges by cellwise addition, the drained shard sketches sum to
    * the batch sketch EXACTLY, cell for cell — same md5-52-bit column
    * hashes as the oracle-checked batch construction (StreamingSpec
    * proves cell-level equality and point-estimate agreement).
    */
  /** Streaming winnowing near-dup screen — dedup-on-arrival at the
    * fuzzy document level (the tier between exact-digest dedup and the
    * batch MinHash screen): each arriving document computes its
    * winnowing fingerprint set ROW-LOCALLY (Round10Queries.winnowFpArray
    * — one fused expression, no window shuffle, which is why a stream
    * can evaluate it at all), explodes to 8-byte fingerprints and
    * stream-static joins the historical corpus's fingerprint index;
    * per-arrival match sets fold with collect_set. Per-batch work, no
    * join state; the historical index is the same retained relation the
    * batch pipeline reads. StreamingSpec proves the drained stream
    * equals the batch fingerprint-join restricted to the arrival
    * subset, and that the row-local fingerprint expression reproduces
    * the windowed batch relation doc for doc.
    */
  def winnowScreenStream(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.tune(spark)
    val hist = graft.queries.DedupQueries.retain(
      graft.queries.Round10Queries.winnowFingerprints(spark, dir)
        .filter(col("doc_id") % 37 =!= 2)
        .select(col("doc_id").as("hist_id"), col("fph")))
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter(col("doc_id") % 37 === 2)
      .select(col("doc_id"),
        explode(graft.queries.Round10Queries.winnowFpArray(
          filter(split(col("text"), " "), w => length(w) > 0))).as("fph"))
      .join(hist, Seq("fph"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("hist_id")).as("matched"))
  }

  /** Streaming trending — the unbounded-feed face of n_trending: one
    * [[graft.operators.DecayedCounter]] per user (1-day half-life,
    * O(1) state per key, history never reprocessed), drained counters
    * rescale to the feed's max timestamp and rank. StreamingSpec
    * proves the drained top-10 equals the batch n_trending ranking
    * within the rescaling law's fp tolerance.
    */
  def trendingStream(spark: SparkSession, dir: String)
      : Dataset[(Long, (Double, Long))] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val ctr = graft.operators.DecayedCounter(86400000000.0)
    source(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, t) => (t, 1.0) }
      .agg(ctr.toColumn.name("counter"))
  }

  def cmsShards(spark: SparkSession, dir: String,
      shards: Int = 8): Dataset[(Int, Array[Long])] = {
    import spark.implicits._
    graft.GraftSession.tune(spark)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val cms = graft.operators.CmsSketch()
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .select(explode(split(col("text"), " ")).as("w")).as[String]
      .filter((w: String) => w.nonEmpty)
      .groupByKey(w => math.floorMod(w.hashCode, shards))
      .agg(cms.toColumn.name("cells"))
  }

  /** Streaming encoding/mojibake audit — the ingestion-time face of
    * n_encoding_audit: every arriving document evaluates its artifact
    * counters ROW-LOCALLY (replacement chars, double-encoded-UTF-8
    * 'Ã', NBSP, C0 controls — the same planted fixture and the same
    * replace()/translate() detectors as the batch query), so the
    * operator is stateless in streaming terms — no watermark, no
    * store, any ingest rate. The per-source rollup happens wherever
    * the per-doc stream lands; StreamingSpec aggregates the streamed
    * rows by source and proves the result equals the batch query
    * exactly.
    */
  def encodingAuditStream(docs: DataFrame): DataFrame = {
    val ctrlChars = ((0x01 to 0x08) ++ Seq(0x0B, 0x0C) ++ (0x0E to 0x1F))
      .map(_.toChar).mkString
    docs
      .select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 11 === 0, lit(" cafÃ©")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit("�")).otherwise(lit("")),
          when(col("doc_id") % 17 === 0, lit("  ")).otherwise(lit("")),
          when(col("doc_id") % 19 === 0, lit("\u0007")).otherwise(lit("")))
          .as("raw"))
      .withColumn("n_repl",
        length(col("raw")) - length(replace(col("raw"), lit("�"), lit(""))))
      .withColumn("n_moji",
        length(col("raw")) - length(replace(col("raw"), lit("Ã"), lit(""))))
      .withColumn("n_nbsp",
        length(col("raw")) - length(replace(col("raw"), lit(" "), lit(""))))
      .withColumn("n_ctrl",
        length(col("raw")) - length(translate(col("raw"), ctrlChars, "")))
      .withColumn("affected",
        (col("n_repl") + col("n_moji") + col("n_nbsp") + col("n_ctrl") > 0)
          .cast("int"))
      .select(col("doc_id"), col("source"), col("n_repl"), col("n_moji"),
        col("n_nbsp"), col("n_ctrl"), col("affected"))
  }

  /** Streaming inter-annotator confusion shards — the unbounded-feed
    * face of n_kappa_agreement: each arriving document classifies
    * row-locally under both rule annotators and lands in one of
    * `shards` 4-counter confusion summaries (n11/n10/n01/n00 —
    * integer counters, the smallest possible mergeable state).
    * Counters merge by ADDITION, so summing shard summaries
    * reproduces the batch confusion matrix — and therefore po, pe and
    * kappa — EXACTLY (StreamingSpec proves it).
    */
  def kappaShards(spark: SparkSession, dir: String,
      shards: Int = 8): DataFrame = {
    graft.GraftSession.tune(spark)
    docSource(spark, dir)
      .select(col("doc_id"),
        (col("n_chars") >= 300).cast("int").as("a"),
        (size(filter(split(col("text"), " "), w => length(w) > 0)) >= 50)
          .cast("int").as("b"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards)))
      .groupBy(col("shard"))
      .agg(
        sum(col("a") * col("b")).cast("bigint").as("n11"),
        sum(col("a") * (lit(1) - col("b"))).cast("bigint").as("n10"),
        sum((lit(1) - col("a")) * col("b")).cast("bigint").as("n01"),
        sum((lit(1) - col("a")) * (lit(1) - col("b"))).cast("bigint").as("n00"))
  }

  final case class TurnState(lastRole: String, runLen: Long, nTurns: Int,
      nEvents: Long, maxUser: Long, maxAsst: Long, opensWith: String)
  final case class TurnOut(user_id: Long, n_events: Long, n_turns: Int,
      max_user_run: Long, max_assistant_run: Long, opens_with: String,
      closes_with: String, strict_alternation: Int)

  /** Streaming dialogue-structure tracker — the live face of
    * n_turn_structure: per-conversation role-run state advances
    * INCREMENTALLY as events arrive (lastRole, current run length,
    * turn count, per-side monologue maxima — O(1) state per
    * conversation however long the dialogue runs), emitting the
    * conversation's current structure summary every trigger. Within a
    * micro-batch events sort by (event-time, event_id) — the
    * sessionize convention; across batches the log is assumed
    * append-ordered per conversation (the chat-transcript reality).
    * StreamingSpec proves the drained summaries equal the batch query
    * row for row.
    */
  def turnStructureStream(spark: SparkSession, events: DataFrame): Dataset[TurnOut] = {
    import spark.implicits._
    def usOf(e: Event): Long =
      Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
    def roleOf(t: String): String =
      if (t == "click" || t == "view" || t == "signup") "user" else "assistant"
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TurnState, TurnOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[TurnState]) =>
          val sorted = rows.toSeq.sortBy(e => (usOf(e), e.event_id))
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val r = roleOf(e.event_type)
            if (st == null)
              st = TurnState(r, 1L, 1, 1L, 0L, 0L, r)
            else if (r == st.lastRole)
              st = st.copy(runLen = st.runLen + 1, nEvents = st.nEvents + 1)
            else {
              // run closes: fold its length into the finished side's max
              val (mu, ma) =
                if (st.lastRole == "user")
                  (math.max(st.maxUser, st.runLen), st.maxAsst)
                else (st.maxUser, math.max(st.maxAsst, st.runLen))
              st = TurnState(r, 1L, st.nTurns + 1, st.nEvents + 1, mu, ma,
                st.opensWith)
            }
          }
          if (st == null) Iterator.empty
          else {
            state.update(st)
            // the summary folds the OPEN run into its side's max
            val mu = if (st.lastRole == "user")
              math.max(st.maxUser, st.runLen) else st.maxUser
            val ma = if (st.lastRole == "assistant")
              math.max(st.maxAsst, st.runLen) else st.maxAsst
            Iterator.single(TurnOut(userId, st.nEvents, st.nTurns, mu, ma,
              st.opensWith, st.lastRole,
              if (st.nTurns.toLong == st.nEvents) 1 else 0))
          }
      }
  }
  /** Streaming transfer-matrix shards — the ingestion face of
    * n_lm_transfer_matrix: the whole k×k cross-entropy matrix is a
    * deterministic function of ONE mergeable summary, the
    * (source, token) count relation, so streaming ingestion keeps
    * doc_id-sharded count shards and the matrix recomputes from their
    * sum at any point — no per-pair state, no reprocessing. State is
    * #shards × #sources × |vocab| counters (model-sized, corpus-
    * independent). StreamingSpec proves the summed shards equal the
    * batch (source, token) relation EXACTLY.
    */
  def transferShards(spark: SparkSession, dir: String,
      shards: Int = 8): DataFrame = {
    graft.GraftSession.tune(spark)
    docSource(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(shards)))
      .groupBy(col("shard"), col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
  }

  /** Streaming ANN decontamination screen — the on-arrival face of
    * n_decontam_semantic_ann: training vectors ARRIVE as a stream and
    * must be screened against a fixed benchmark before admission. The
    * 37 Hamming<=2 probe masks explode on the STATIC benchmark side
    * (XOR symmetry: probing either side yields the same Hamming<=2
    * pair set), so each arriving vector computes ONE portable 8-bit
    * signature map-only and meets a broadcast (bid, probe-sig, bv)
    * relation of 37 x |benchmark| rows; bucket cohabitants get the
    * exact cosine rerank, sim >= 0.3 flags. STATELESS in streaming
    * terms — no watermark, no state store (a vector's signature
    * matches at most one probe signature per benchmark item, so the
    * join emits no duplicates) — the shape that screens any ingest
    * rate against a benchmark that broadcasts once.
    * StreamingSpec proves the drained per-benchmark rollup equals
    * n_decontam_semantic_ann's batch candidates exactly.
    */
  def annScreenStream(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.tune(spark)
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val bench = graft.queries.Round12Queries.withSig(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("bid"), col("embedding").as("bv")), "bv")
    val benchProbes = bench
      .withColumn("m", explode(typedLit(graft.queries.Round12Queries.probeMasks)))
      .select(col("bid"), col("bv"), col("sig").bitwiseXOR(col("m")).as("psig"))
    val arriving = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
      .filter(col("vec_id") % 97 =!= 0)
      .select(col("vec_id"), col("embedding"))
    graft.queries.Round12Queries.withSig(arriving, "embedding")
      .join(broadcast(benchProbes), col("sig") === col("psig"))
      .withColumn("sim",
        round(graft.queries.SimilarityQueries.cosine("bv", "embedding"), 6))
      .select(col("vec_id"), col("bid"), col("sim"),
        (col("sim") >= 0.3).cast("int").as("contaminated"))
  }
}
