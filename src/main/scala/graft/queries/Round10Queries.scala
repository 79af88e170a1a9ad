package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 additions — the sketch/summary corner of the
  * LLM-data-pipeline surface: the bounded-state primitives a 100 TB
  * pipeline leans on when exact answers are unaffordable or when state
  * must stream/merge. All three are *portable* constructions — every
  * hash is a 52-bit md5 prefix (the n_priority_sample / n_shard_assign
  * trick), so DuckDB computes bit-identical sketches and the oracle is
  * a full value check, not a rows-only waiver:
  *
  *   - n_bloom_filter: Bloom membership over content digests — build
  *     on the "historical" half of the corpus, probe everything, report
  *     zero false negatives and the measured-vs-theoretical FP rate.
  *     The filter is 64 lanes x 63 bits (DuckDB's `<<` errors at shift
  *     63, so bit 63 stays unused by construction); build is a
  *     lane-keyed bit_or aggregate (64 rows of state regardless of
  *     corpus size — the mergeable, broadcastable shape), probe is a
  *     broadcast join. At 100 TB the filter is what ships to the
  *     ingest frontier so arrivals skip the dedup shuffle entirely
  *     when the filter says "definitely new".
  *   - n_cms_freq: Count-Min sketch (Cormode–Muthukrishnan) token
  *     frequencies — d=4 rows x w=256 counters built as one
  *     (row,col)-keyed exact aggregate from the token-count relation
  *     (equivalent to per-occurrence updates, but one pass over counts
  *     — the map-side-combined spelling); point queries take the min
  *     over rows. The CMS guarantee (est >= true, over-count bounded
  *     by eN/w) is asserted in Round10Spec; state is d*w counters no
  *     matter how many tokens flow through.
  *   - n_kmv_distinct: KMV / bottom-k cardinality (the Theta-sketch
  *     construction): keep the k=64 smallest normalized 52-bit hashes
  *     of the key set, estimate distinct = (k-1)/u_(k). The k-row
  *     bound is what merges across shards/streams for free; Spark
  *     plans it as TakeOrderedAndProject (per-partition top-k, k-row
  *     merge — no full shuffle of the key set).
  *
  * Reference scope: fb64/uquery-rs exposes arbitrary SQL over its
  * corpus tables (src/core/duckdb.rs:87); these queries are the
  * training-data-pipeline surface the builder prompt adds on top.
  */
object Round10Queries extends QueryModule {

  /** 52-bit uniform hash both engines compute bit-identically:
    * first 13 hex digits of md5(salt || key), as BIGINT.
    * DuckDB spelling: CAST(concat('0x', substr(md5(..),1,13)) AS BIGINT).
    */
  private def h52(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key)), 1, 13), 16, 10).cast("bigint")

  override val queries: Seq[Q] = Seq(
    Q("n_bloom_filter",
      "Portable Bloom filter membership sketch (m=4032 bits as 64x63-bit BIGINT lanes, k=4 md5-derived hashes): build over the even-doc_id half's content digests, probe every doc, and report per-side detection — members hit 4/4 bits always (no false negatives, the Bloom guarantee), non-members pass at the measured false-positive rate alongside the theoretical (1-e^(-kn/m))^k bound. Scale shape: the filter is a 64-row lane-keyed bit_or aggregate — mergeable, 512 bytes of state regardless of corpus size — and the probe side joins against those 64 broadcast rows; at ingest, arrivals that miss any bit skip the dedup shuffle entirely.",
      (s, dir) => {
        val d = T(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("dg"),
            (col("doc_id") % 2).as("par"))
        // k=4 positions per key; lane/bit split keeps every shift < 63
        // (DuckDB's BIGINT << 63 is an overflow error, so bit 63 is
        // structurally unused on both engines)
        val bits = d
          .select(col("doc_id"), col("par"), col("dg"),
            explode(array((0 until 4).map(lit): _*)).as("i"))
          .withColumn("h",
            h52("", concat(lit("graft-bloom-"), col("i").cast("string"),
              lit(":"), col("dg"))) % 4032)
          .select(col("doc_id"), col("par"),
            expr("h div 63").as("lane"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 63 AS INT))").as("mask"))
        // the filter: 64 rows, one bit_or lane each — broadcast side
        val filt = bits.filter(col("par") === 0)
          .groupBy(col("lane")).agg(expr("bit_or(mask)").as("bm"))
        val probe = bits.join(broadcast(filt), Seq("lane"), "left")
          .groupBy(col("doc_id"), col("par"))
          .agg(min(when(expr("(COALESCE(bm, CAST(0 AS BIGINT)) & mask) = mask"), 1)
            .otherwise(0)).as("hit"))
        val nMembers = broadcast(d.filter(col("par") === 0)
          .agg(count(lit(1)).as("nm")))
        probe.crossJoin(nMembers)
          .groupBy(col("par"), col("nm"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("hit")).as("predicted_present"),
            round(sum(col("hit")).cast("double") / count(lit(1)), 6).as("hit_rate"))
          .select(
            when(col("par") === 0, "member").otherwise("non_member").as("side"),
            col("n_docs"), col("predicted_present"), col("hit_rate"),
            round(pow(lit(1.0) - exp(lit(-4.0) * col("nm") / 4032.0), 4), 6)
              .as("fp_bound"))
          .orderBy(col("side").asc_nulls_last)
      },
      Some("""WITH d AS (SELECT doc_id, md5(text) dg, doc_id % 2 AS par FROM documents),
        hs AS (SELECT doc_id, par, i,
                 CAST(concat('0x', substr(md5('graft-bloom-' || CAST(i AS VARCHAR) || ':' || dg),1,13)) AS BIGINT) % 4032 AS h
               FROM d, unnest([0,1,2,3]) t(i)),
        bits AS (SELECT doc_id, par, h // 63 AS lane, (1::BIGINT << CAST(h % 63 AS INT)) AS mask FROM hs),
        filt AS (SELECT lane, bit_or(mask) AS bm FROM bits WHERE par = 0 GROUP BY lane),
        probe AS (SELECT b.doc_id, b.par, min(CASE WHEN (COALESCE(f.bm, 0::BIGINT) & b.mask) = b.mask THEN 1 ELSE 0 END) AS hit
                  FROM bits b LEFT JOIN filt f ON b.lane = f.lane GROUP BY b.doc_id, b.par),
        n AS (SELECT count(*) nm FROM d WHERE par = 0)
        SELECT CASE WHEN par = 0 THEN 'member' ELSE 'non_member' END AS side,
          count(*) AS n_docs, sum(hit) AS predicted_present,
          round(CAST(sum(hit) AS DOUBLE)/count(*), 6) AS hit_rate,
          round(pow(1.0 - exp(-4.0 * nm / 4032.0), 4), 6) AS fp_bound
        FROM probe CROSS JOIN n GROUP BY par, nm ORDER BY side ASC NULLS LAST""")),

    Q("n_cms_freq",
      "Count-Min sketch token frequencies (Cormode-Muthukrishnan, d=4 rows x w=256 counters, md5-derived column hashes): the sketch is one (row,col)-keyed exact-integer aggregate built from the token-count relation (identical to per-occurrence increments, folded map-side), point estimates for the 20 most frequent tokens take the min over the 4 rows, and the output carries est - true as the measured over-count (the CMS guarantee: est >= true always, over-count bounded by the colliding mass). Scale shape: d*w = 1024 counters of state however many tokens stream through — the sketch merges by cellwise addition across shards, and the heavy-hitter probe joins 20 tokens against <=1024 broadcast cells.",
      (s, dir) => {
        val tc = T(s, dir, "documents")
          .select(explode(filter(split(col("text"), " "),
            w => length(w) > 0)).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val pos = tc
          .select(col("tok"), col("cnt"),
            explode(array((0 until 4).map(lit): _*)).as("i"))
          .withColumn("c",
            h52("", concat(lit("graft-cms-"), col("i").cast("string"),
              lit(":"), col("tok"))) % 256)
        val sk = pos.groupBy(col("i"), col("c")).agg(sum(col("cnt")).as("total"))
        val top = tc.orderBy(col("cnt").desc_nulls_last, col("tok").asc_nulls_last)
          .limit(20)
        top.join(pos.select(col("tok"), col("i"), col("c")), Seq("tok"))
          .join(broadcast(sk), Seq("i", "c"))
          .groupBy(col("tok"), col("cnt"))
          .agg(min(col("total")).as("est"))
          .select(col("tok"), col("cnt").as("true_cnt"), col("est"),
            (col("est") - col("cnt")).as("overcount"))
          .orderBy(col("true_cnt").desc_nulls_last, col("tok").asc_nulls_last)
      },
      Some("""WITH w AS (SELECT unnest(list_filter(string_split(text,' '), x -> len(x)>0)) AS tok FROM documents),
        tc AS (SELECT tok, count(*) AS cnt FROM w GROUP BY tok),
        pos AS (SELECT tok, cnt, i, CAST(concat('0x', substr(md5('graft-cms-'||CAST(i AS VARCHAR)||':'||tok),1,13)) AS BIGINT) % 256 AS c
                FROM tc, unnest([0,1,2,3]) t(i)),
        sk AS (SELECT i, c, sum(cnt) AS total FROM pos GROUP BY i, c),
        top AS (SELECT tok, cnt FROM tc ORDER BY cnt DESC, tok LIMIT 20),
        est AS (SELECT t.tok, t.cnt, min(sk.total) AS est
                FROM top t JOIN pos p ON t.tok = p.tok JOIN sk ON p.i = sk.i AND p.c = sk.c
                GROUP BY t.tok, t.cnt)
        SELECT tok, cnt AS true_cnt, est, est - cnt AS overcount FROM est
        ORDER BY true_cnt DESC NULLS LAST, tok ASC NULLS LAST""")),

    Q("n_kmv_distinct",
      "KMV / bottom-k cardinality sketch (the Theta-sketch construction): hash every distinct event user to a 52-bit uniform, keep the k=64 smallest, estimate distinct = (k-1)/u_(k) with u_(k) the k-th smallest hash normalized to [0,1). Output pins k, the true cardinality, the estimate and its relative error (expected ~1/sqrt(k-1) ~ 12.5%% at k=64). Scale shape: per-partition top-k merges as a k-row summary (TakeOrderedAndProject — no full shuffle of the key set), the sketch unions across shards/streams by keeping the k smallest of the concatenation, and state is k hashes regardless of stream length.",
      (s, dir) => {
        val hv = T(s, dir, "events")
          .select(col("user_id")).distinct()
          .select(h52("graft-kmv:", col("user_id").cast("string")).as("hv"))
        // KMV rule: a non-full sketch IS the exact distinct count;
        // only a full sketch estimates via the k-th order statistic
        val kth = hv.orderBy(col("hv").asc_nulls_last).limit(64)
          .agg(count(lit(1)).as("held"), max(col("hv")).as("hk"))
        val t = T(s, dir, "events")
          .agg(countDistinct(col("user_id")).as("true_distinct"))
        kth.crossJoin(t)
          .withColumn("raw",
            when(col("held") < 64, col("held").cast("double"))
              .otherwise(lit(63.0) / (col("hk").cast("double") / 4503599627370496.0)))
          .select(lit(64).as("k"), col("true_distinct"),
            round(col("raw"), 4).as("est"),
            round(abs(col("raw") - col("true_distinct")) / col("true_distinct"), 4)
              .as("rel_err"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
        h AS (SELECT CAST(concat('0x', substr(md5('graft-kmv:'||CAST(user_id AS VARCHAR)),1,13)) AS BIGINT) AS hv FROM u),
        k AS (SELECT hv, row_number() OVER (ORDER BY hv) AS r FROM h),
        sel AS (SELECT count(*) AS held, max(hv) AS hk FROM k WHERE r <= 64),
        t AS (SELECT count(DISTINCT user_id) AS true_distinct FROM events),
        e AS (SELECT held, hk, true_distinct,
                CASE WHEN held < 64 THEN CAST(held AS DOUBLE)
                     ELSE 63.0 / (CAST(hk AS DOUBLE) / 4503599627370496.0) END AS raw
              FROM sel CROSS JOIN t)
        SELECT 64 AS k, true_distinct, round(raw, 4) AS est,
          round(abs(raw - true_distinct)/true_distinct, 4) AS rel_err
        FROM e"""))
  )
}
