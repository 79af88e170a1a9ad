package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 coverage: the remaining DuckDB-dialect sugar reachable
  * through the reference's SQL endpoint (NATURAL JOIN, GROUP BY ALL,
  * ORDER BY ALL — uquery-rs delegates the whole dialect at
  * src/core/duckdb.rs:88), interval/timezone arithmetic (SURVEY §2.2 H
  * date/time family), a PORTABLE SimHash whose md5-derived bit votes
  * are oracle-checked exactly, and an IVF-style ANN cell-probe path.
  */
object Round2Queries extends QueryModule {

  /** 8 deterministic 64-dim integer hyperplanes for the portable LSH:
    * components in [-500, 500] from MD5("b:d") — computed once at
    * authoring time and rendered into BOTH engines' expressions, so no
    * cross-engine hash agreement is even needed.
    */
  private[graft] lazy val lshPlanes: Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 8).map { b =>
      (0 until 64).map { d =>
        val h = md.digest(s"$b:$d".getBytes("UTF-8"))
        val v = ((h(0) & 0xff) << 24) | ((h(1) & 0xff) << 16) | ((h(2) & 0xff) << 8) | (h(3) & 0xff)
        (Math.floorMod(v, 1001) - 500)
      }
    }
  }

  /** 32-bit token hash both engines compute bit-identically: the first
    * 8 hex digits of md5, parsed as an integer. Spark spells it conv();
    * the DuckDB oracle folds hex digits with list_reduce. Engine-native
    * hashes (xxhash64) differ across engines — md5 is the portable
    * intersection, used only on oracle-checked variants.
    */
  private val sparkTokHash = "CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)"
  private val duckTokHash =
    """list_reduce(list_transform(range(1, 9),
      |  i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT)),
      |  (a, b) -> a * 16 + b)""".stripMargin

  override val queries: Seq[Q] = Seq(

    Q("c_join_natural",
      "NATURAL JOIN: equi-join on all same-named columns (DuckDB dialect; the TPC-H prefix convention means the shared key is surfaced via aliasing subqueries).",
      (s, dir) => {
        T.views(s, dir, "nation", "region")
        s.sql("""SELECT r_name, n_name
          FROM (SELECT n_name, n_regionkey AS regionkey FROM nation) n
          NATURAL JOIN (SELECT r_name, r_regionkey AS regionkey FROM region) r
          ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""")
      },
      Some("""SELECT r_name, n_name
        FROM (SELECT n_name, n_regionkey AS regionkey FROM nation) n
        NATURAL JOIN (SELECT r_name, r_regionkey AS regionkey FROM region) r
        ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""")),

    Q("d_group_by_all",
      "GROUP BY ALL (DuckDB sugar, native in Spark ≥3.4): group by every non-aggregated select item.",
      (s, dir) => {
        T.views(s, dir, "lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
            round(CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE), 2) AS qty
          FROM lineitem GROUP BY ALL
          ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
          round(CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE), 2) AS qty
        FROM lineitem GROUP BY ALL
        ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""")),

    Q("f_order_by_all",
      "ORDER BY ALL (DuckDB sugar, native in Spark ≥3.4): sort by every select item left-to-right. Null-free keys — the engines' default null placement differs.",
      (s, dir) => {
        T.views(s, dir, "nation")
        s.sql("SELECT n_regionkey, n_name FROM nation ORDER BY ALL")
      },
      Some("SELECT n_regionkey, n_name FROM nation ORDER BY ALL")),

    Q("h_interval_tz",
      "INTERVAL arithmetic (day + calendar-month clamping) and AT TIME ZONE: UTC instants rendered as wall time in named zones. Session-TZ-independent on both engines (double timezone() in DuckDB, from_utc_timestamp in Spark).",
      (s, dir) => {
        T.views(s, dir, "orders")
        s.sql("""SELECT o_orderkey,
            CAST(o_orderdate + INTERVAL '3' DAY AS DATE) AS ship_by,
            CAST(o_orderdate - INTERVAL '1' MONTH AS DATE) AS month_prior,
            date_format(from_utc_timestamp(CAST(o_orderdate AS TIMESTAMP), 'America/New_York'),
                        'yyyy-MM-dd HH:mm') AS ny_wall,
            date_format(from_utc_timestamp(CAST(o_orderdate AS TIMESTAMP) + INTERVAL '90' MINUTE, 'Asia/Tokyo'),
                        'yyyy-MM-dd HH:mm') AS tokyo_wall
          FROM orders WHERE o_orderkey < 200
          ORDER BY o_orderkey ASC NULLS LAST""")
      },
      Some("""SELECT o_orderkey,
          CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS ship_by,
          CAST(o_orderdate - INTERVAL 1 MONTH AS DATE) AS month_prior,
          strftime(timezone('America/New_York', timezone('UTC', CAST(o_orderdate AS TIMESTAMP))),
                   '%Y-%m-%d %H:%M') AS ny_wall,
          strftime(timezone('Asia/Tokyo', timezone('UTC', CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 MINUTE)),
                   '%Y-%m-%d %H:%M') AS tokyo_wall
        FROM orders WHERE o_orderkey < 200
        ORDER BY o_orderkey ASC NULLS LAST""")),

    Q("e_named_window",
      "Named WINDOW clause: one window definition shared by several functions (both dialects).",
      (s, dir) => {
        T.views(s, dir, "orders")
        s.sql("""SELECT o_orderkey, o_custkey,
            row_number() OVER w AS rn,
            round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) OVER w AS DOUBLE), 2) AS running_total,
            lag(o_orderkey, 1) OVER w AS prev_key
          FROM orders WHERE o_custkey < 50
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST)
          ORDER BY o_custkey ASC NULLS LAST, rn ASC NULLS LAST""")
      },
      Some("""SELECT o_orderkey, o_custkey,
          row_number() OVER w AS rn,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) OVER w AS DOUBLE), 2) AS running_total,
          lag(o_orderkey, 1) OVER w AS prev_key
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST)
        ORDER BY o_custkey ASC NULLS LAST, rn ASC NULLS LAST""")),

    Q("e_ignore_nulls",
      "IGNORE NULLS in lag/lead/last_value: carry the last non-null observation forward (the gap-fill idiom).",
      (s, dir) => {
        T.views(s, dir, "events")
        // note the dialect split: Spark spells IGNORE NULLS after the call,
        // DuckDB inside the argument parens — same semantics
        s.sql("""SELECT event_id, user_id,
            last_value(nullif(value, 0.0)) IGNORE NULLS OVER
              (PARTITION BY user_id ORDER BY event_id ASC NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nonzero_value,
            lag(nullif(value, 0.0), 1) IGNORE NULLS OVER
              (PARTITION BY user_id ORDER BY event_id ASC NULLS LAST) AS prev_nonzero_value
          FROM events WHERE user_id < 20
          ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""")
      },
      Some("""SELECT event_id, user_id,
          last_value(nullif(value, 0.0) IGNORE NULLS) OVER
            (PARTITION BY user_id ORDER BY event_id ASC NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nonzero_value,
          lag(nullif(value, 0.0), 1 IGNORE NULLS) OVER
            (PARTITION BY user_id ORDER BY event_id ASC NULLS LAST) AS prev_nonzero_value
        FROM events WHERE user_id < 20
        ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""")),

    Q("d_within_group",
      "Ordered-set aggregates: percentile_cont/percentile_disc WITHIN GROUP (ORDER BY ...).",
      (s, dir) => {
        // r15: spread scan — exact percentiles are order-independent
        T.viewsPar(s, dir, "orders")
        s.sql("""SELECT o_orderstatus,
            round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50_cont,
            percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50_disc,
            round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90_cont
          FROM orders GROUP BY o_orderstatus
          ORDER BY o_orderstatus ASC NULLS LAST""")
      },
      Some("""SELECT o_orderstatus,
          round(quantile_cont(o_totalprice, 0.5), 4) AS p50_cont,
          quantile_disc(o_totalprice, 0.5) AS p50_disc,
          round(quantile_cont(o_totalprice, 0.9), 4) AS p90_cont
        FROM orders GROUP BY o_orderstatus
        ORDER BY o_orderstatus ASC NULLS LAST""")),

    Q("d_regression",
      "Linear-regression aggregate family: regr_slope/intercept/r2/count/avgx/avgy (same names both dialects).",
      (s, dir) => {
        T.views(s, dir, "lineitem")
        s.sql("""SELECT l_returnflag,
            round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
            round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
            round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
            CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
            round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
            round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
          FROM lineitem GROUP BY l_returnflag
          ORDER BY l_returnflag ASC NULLS LAST""")
      },
      Some("""SELECT l_returnflag,
          round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
          round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
          round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
          CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
          round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
          round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag ASC NULLS LAST""")),

    Q("i_date_series",
      "generate_series over dates with an interval step (the calendar-spine gap-fill idiom). Scale shape: the fact side bins to its week ARITHMETICALLY map-side and partial-aggregates, then the tiny spine left-joins the 13-row aggregate — never a range join that broadcasts the fact table.",
      (s, dir) => {
        T.views(s, dir, "orders")
        s.sql("""WITH binned AS (
            SELECT date_sub(CAST(o_orderdate AS DATE),
                            pmod(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01'), 7)) AS d,
                   o_orderkey
            FROM orders
            WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-02'),
          agg AS (SELECT d, count(o_orderkey) AS n FROM binned GROUP BY d)
          SELECT d, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
          FROM (SELECT explode(sequence(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 7 DAY)) AS d) spine
          LEFT JOIN agg USING (d)
          ORDER BY d ASC NULLS LAST""")
      },
      Some("""WITH binned AS (
          SELECT CAST(o_orderdate AS DATE)
                   - CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 7 AS INTEGER) AS d,
                 o_orderkey
          FROM orders
          WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-02'),
        agg AS (SELECT d, count(o_orderkey) AS n FROM binned GROUP BY d)
        SELECT d, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 7 DAY)) AS DATE) AS d) spine
        LEFT JOIN agg USING (d)
        ORDER BY d ASC NULLS LAST""")),

    Q("e_frame_exclude_rewrite",
      "Window frame EXCLUDE CURRENT ROW: Spark lacks the clause, so the full-partition aggregate minus the row's own contribution is the algebraic realization; the oracle exercises DuckDB's NATIVE EXCLUDE CURRENT ROW. Exact-decimal accumulation keeps both engines' subtraction operands identical.",
      (s, dir) => {
        T.views(s, dir, "events")
        s.sql("""SELECT user_id, event_id,
            round(CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id)
                       - CAST(value AS DECIMAL(20,6)) AS DOUBLE), 4) AS others_total
          FROM events WHERE user_id < 20
          ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""")
      },
      Some("""SELECT user_id, event_id,
          round(CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
              EXCLUDE CURRENT ROW) AS DOUBLE), 4) AS others_total
        FROM events WHERE user_id < 20
        ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""")),

    Q("e_frame_exclude_group_ties",
      "Frame EXCLUDE GROUP / EXCLUDE TIES: Spark realizations are algebraic (partition total minus the ORDER-BY-peer-group sum, re-adding the row itself for TIES); the oracle runs DuckDB's native clauses.",
      (s, dir) => {
        T.views(s, dir, "events")
        s.sql("""SELECT user_id, event_id, event_type,
            round(CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id)
                       - sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id, event_type)
                  AS DOUBLE), 4) AS excl_group,
            round(CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id)
                       - sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id, event_type)
                       + CAST(value AS DECIMAL(20,6))
                  AS DOUBLE), 4) AS excl_ties
          FROM events WHERE user_id < 20
          ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""")
      },
      Some("""SELECT user_id, event_id, event_type,
          round(CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id ORDER BY event_type
              RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
              EXCLUDE GROUP) AS DOUBLE), 4) AS excl_group,
          round(CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (PARTITION BY user_id ORDER BY event_type
              RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
              EXCLUDE TIES) AS DOUBLE), 4) AS excl_ties
        FROM events WHERE user_id < 20
        ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""")),

    Q("i_pivot_dynamic",
      "Dynamic PIVOT: spreading values auto-detected from the data (two-pass in Spark, same in DuckDB); both engines name the generated columns by the distinct values, so the dynamic shapes hash-match.",
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus")
          .agg(count(lit(1)))
          .orderBy(col("o_orderpriority").asc_nulls_last),
      Some("""SELECT * FROM (PIVOT orders ON o_orderstatus USING count(*) GROUP BY o_orderpriority)
        ORDER BY o_orderpriority ASC NULLS LAST""")),

    Q("n_simhash_portable",
      "Portable SimHash-32: md5-derived per-token hashes vote on 32 bit positions; the signature is oracle-checked bit-for-bit (the engine-native 64-bit variant, n_dedup_simhash, stays the fast path).",
      (s, dir) =>
        // r15: spread — the 32-bit × token interpreted vote fold is the CPU
        T.par(s, dir, "documents")
          .filter(col("doc_id") < 300)
          .select(col("doc_id"),
            expr(s"""aggregate(sequence(0, 31), 0L, (acc, b) -> acc +
                IF(aggregate(
                     transform(array_distinct(filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')),
                               t -> $sparkTokHash),
                     0L, (a, h) -> a + IF(((h >> b) & 1) = 1, 1L, -1L)) >= 0,
                   shiftleft(1L, b), 0L))""").as("sig32"))
          .orderBy(col("doc_id").asc_nulls_last),
      Some(s"""WITH toks AS (
          SELECT doc_id,
            list_transform(
              list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')),
              t -> $duckTokHash) AS hs
          FROM documents WHERE doc_id < 300)
        SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 32), b ->
            CASE WHEN list_sum(list_transform(hs, h ->
                   CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
                 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS sig32
        FROM toks
        ORDER BY doc_id ASC NULLS LAST""")),

    Q("a_glob_files",
      "File-listing table function (DuckDB glob()): enumerate the datasets under the scale dir. Spark side lists via the Hadoop FileSystem (the same metadata op its FileIndex performs); basenames are sf-invariant so the oracle can glob the driver's verify dir.",
      (s, dir) => {
        import s.implicits._
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
        fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/*.parquet"))
          .map(_.getPath.getName).toSeq.toDF("file_name")
          .orderBy(col("file_name").asc_nulls_last)
      },
      Some("""SELECT regexp_extract(file, '[^/]+$') AS file_name
        FROM glob('/root/testdata/sf0.01/*.parquet')
        ORDER BY file_name ASC NULLS LAST""")),

    Q("n_minhash_portable",
      "Portable MinHash-4: md5-derived token hashes under four affine permutations mod 2^31-1; per-doc signatures oracle-checked exactly (the banded xxhash64 pipeline, n_dedup_minhash_lsh, stays the fast path).",
      (s, dir) => {
        val perms = Seq((131L, 7L), (137L, 11L), (139L, 13L), (149L, 17L))
        val hashes =
          s"""transform(array_distinct(filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')),
              t -> $sparkTokHash % 2147483647)"""
        val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
          expr(s"array_min(transform($hashes, h -> ($a * h + $b) % 2147483647))").as(s"s$i")
        }
        T(s, dir, "documents")
          .filter(col("doc_id") < 300)
          .select(col("doc_id") +: sigCols: _*)
          .orderBy(col("doc_id").asc_nulls_last)
      },
      Some {
        val perms = Seq((131L, 7L), (137L, 11L), (139L, 13L), (149L, 17L))
        val sigs = perms.zipWithIndex.map { case ((a, b), i) =>
          s"list_min(list_transform(hs, h -> ($a * h + $b) % 2147483647)) AS s$i"
        }.mkString(",\n          ")
        s"""WITH toks AS (
          SELECT doc_id,
            list_transform(
              list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')),
              t -> $duckTokHash % 2147483647) AS hs
          FROM documents WHERE doc_id < 300)
        SELECT doc_id,
          $sigs
        FROM toks
        ORDER BY doc_id ASC NULLS LAST"""
      }),

    Q("i_sample_hash_split",
      "Deterministic hash-based train/test split: md5-bucket each key mod 100, <80 → train. THE reproducible-sampling pattern at scale (same rows on any engine, any run, any partitioning — unlike seeded RNG sampling, which is engine-specific and stays rows-only as i_sample_seeded).",
      (s, dir) => {
        T.views(s, dir, "orders")
        s.sql("""SELECT split,
            count(*) AS n,
            round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE), 2) AS total
          FROM (SELECT o_totalprice,
                  IF(CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 < 80,
                     'train', 'test') AS split
                FROM orders)
          GROUP BY split
          ORDER BY split ASC NULLS LAST""")
      },
      Some("""SELECT split,
          count(*) AS n,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE), 2) AS total
        FROM (SELECT o_totalprice,
                CASE WHEN list_reduce(list_transform(range(1, 9),
                       i -> CAST(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
                       (a, b) -> a * 16 + b) % 100 < 80
                     THEN 'train' ELSE 'test' END AS split
              FROM orders)
        GROUP BY split
        ORDER BY split ASC NULLS LAST""")),

    Q("n_dedup_embedding",
      "Embedding-cosine near-dup DEDUP: inside each label block, greedily keep the lowest vec_id of every near-dup pair (sim ≥ 0.3); survivors = corpus anti-joined with the dropped-id set. The blocked pair space keeps it off O(n²) global.",
      (s, dir) => {
        val sub = T(s, dir, "embeddings").filter(col("vec_id") < 200)
        val a = sub.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = sub.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("vb"))
        val dropped = a.join(b, Seq("label"))
          .filter(col("id_a") < col("id_b"))
          .filter(round(SimilarityQueries.cosine("va", "vb"), 6) >= 0.3)
          .select(col("id_b").as("vec_id")).distinct()
        sub.join(dropped, Seq("vec_id"), "left_anti")
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_kept"),
               min(col("vec_id")).as("min_kept"),
               max(col("vec_id")).as("max_kept"))
          .orderBy(col("label").asc_nulls_last)
      },
      Some("""WITH e AS (SELECT label, vec_id, embedding FROM embeddings WHERE vec_id < 200),
        dropped AS (
          SELECT DISTINCT b.vec_id
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE round(
              list_sum(list_transform(list_zip(a.embedding, b.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) >= 0.3)
        SELECT label, count(*) AS n_kept,
               min(vec_id) AS min_kept, max(vec_id) AS max_kept
        FROM e WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        GROUP BY label
        ORDER BY label ASC NULLS LAST""")),

    Q("n_ann_lsh_portable",
      "Portable random-hyperplane LSH bucketing: 8 integer hyperplanes derived from MD5 at AUTHORING time render identically into the Spark expression and the oracle SQL, so bucket signatures (and the resulting bucket histogram) hash-match exactly. The engine-native variant, n_ann_lsh_buckets, stays the fast path.",
      (s, dir) => {
        // r15: the 8-plane HOF signature (8 interpreted lambda chains +
        // 8 typedLit arrays per row) ran inside the single-split scan —
        // the fused codegen PlaneSignature kernel (PlaneSignatureSpec
        // pins value equality) over the spread scan replaces it
        // (guide §2.5 + §4.1); cast back to the original LONG sig type.
        val df = T.par(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        df.withColumn("sig", graft.functions.PlaneSignature(
            col("embedding"), lshPlanes).cast("long"))
          .groupBy(col("sig"))
          .agg(count(lit(1)).as("n"),
               min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
          .orderBy(col("sig").asc_nulls_last)
      },
      Some {
        val bits = lshPlanes.zipWithIndex.map { case (hp, b) =>
          val lst = hp.mkString("[", ", ", "]")
          s"""(CASE WHEN list_sum(list_transform(list_zip($lst, embedding),
              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) >= 0
              THEN ${1L << b} ELSE 0 END)"""
        }.mkString("\n            + ")
        s"""WITH sigs AS (
          SELECT vec_id,
            $bits AS sig
          FROM embeddings)
        SELECT sig, count(*) AS n, min(vec_id) AS min_id, max(vec_id) AS max_id
        FROM sigs GROUP BY sig
        ORDER BY sig ASC NULLS LAST"""
      }),

    Q("n_tfidf_topterms",
      "TF-IDF top-3 terms per document (explode → per-doc term counts → document frequencies → tf·idf rank). Every stage partial-aggregates before its shuffle; the doc-frequency side is a token-keyed aggregate joined back by token.",
      (s, dir) => {
        // r15: spread scan — the regex tokenize + explode is the CPU
        T.viewsPar(s, dir, "documents")
        s.sql("""WITH docs AS (
            SELECT doc_id, filter(split(lower(text), '[^a-z0-9]+'), t -> t != '') AS toks
            FROM documents WHERE doc_id < 200),
          tf AS (
            SELECT doc_id, tok, count(*) AS tf
            FROM (SELECT doc_id, explode(toks) AS tok FROM docs)
            GROUP BY doc_id, tok),
          df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),  -- tf is already unique per (doc_id, tok)
          n AS (SELECT count(*) AS n_docs FROM docs),
          scored AS (
            SELECT doc_id, tok,
              -- ln, not log: the registry's DuckDB-semantics log() is
              -- base 10 (round-11 dispatch), and this score is natural
              round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
            FROM tf JOIN df USING (tok) CROSS JOIN n)
          SELECT doc_id, rk, tok, score FROM (
            SELECT doc_id, tok, score,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC NULLS LAST, tok ASC NULLS LAST) AS rk
            FROM scored)
          WHERE rk <= 3
          ORDER BY doc_id ASC NULLS LAST, rk ASC NULLS LAST""")
      },
      Some("""WITH docs AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '') AS toks
          FROM documents WHERE doc_id < 200),
        tf AS (
          SELECT doc_id, tok, count(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS tok FROM docs) t
          GROUP BY doc_id, tok),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT count(*) AS n_docs FROM docs),
        scored AS (
          SELECT doc_id, tok,
            round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
          FROM tf JOIN df USING (tok) CROSS JOIN n)
        SELECT doc_id, rk, tok, score FROM (
          SELECT doc_id, tok, score,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC NULLS LAST, tok ASC NULLS LAST) AS rk
          FROM scored) t
        WHERE rk <= 3
        ORDER BY doc_id ASC NULLS LAST, rk ASC NULLS LAST""")),

    Q("n_ann_ivf",
      "IVF-style ANN: per-label mean embeddings are the coarse cells (trained from the data, broadcast); each probe scans only its nprobe=4 nearest cells and reranks with exact cosine. Oracle-exempt (float argmax cell assignment) twin=n_ann_ivf_portable (oracle-passing SQL-expressible twin; n_ann_recall is the recall harness); spec measures recall vs brute force.",
      (s, dir) => ivfTopK(s, dir, nprobe = 4, k = 5),
      None),
  )

  /** IVF pipeline shared by the query entry and the recall spec.
    *
    * Scale shape (the k-means serving pattern): the k trained centroids
    * ALWAYS fit the driver, so they ship to executors as one literal and
    * cell assignment is MAP-ONLY over the corpus — no corpus×k cross
    * join, no corpus-wide window shuffle. The only corpus shuffle left
    * is the candidate equi-join on the probed cell ids.
    */
  def ivfTopK(s: SparkSession, dir: String, nprobe: Int, k: Int): DataFrame = {
    // r15: spread the single-split scan (training explode + map-only
    // assignment HOFs are the CPU; guide §2.5)
    val emb = T.par(s, dir, "embeddings").select(col("vec_id"), col("label"), col("embedding"))
    // train coarse cells: per-label mean embedding via dimension-exploded
    // avg (no array-avg builtin), restitched in dim order, collected —
    // k×64 floats, the classic "model to driver, broadcast back" step
    val centRows: Seq[(Int, Double, Seq[Float])] = emb
      .select(col("label").as("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim")).agg(avg(col("v")).as("cv"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, cv))), x -> CAST(x.cv AS FLOAT))")
        .as("centroid"))
      .collect().toSeq
      .map { r =>
        val vec = r.getSeq[Float](1)
        val nv = math.sqrt(vec.map(x => x.toDouble * x.toDouble).sum)
        (r.getInt(0), if (nv == 0.0) 1.0 else nv, vec)
      }.sortBy(_._1)
    val cLit = typedLit(centRows) // array<struct<_1:cell, _2:||centroid||, _3:centroid>>
    // per-cell scores for one row: dot(embedding, centroid)/||centroid||;
    // the row's own norm is constant across cells, so argmax skips it
    val cellScores =
      """transform(C, x -> named_struct(
        's', aggregate(zip_with(x._3, embedding, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
                       0D, (a, b) -> a + b) / x._2,
        'c', x._1))"""
    val assigned = emb.withColumn("C", cLit)
      .withColumn("cell", expr(s"array_max($cellScores).c"))
      .select(col("vec_id"), col("cell"), col("embedding"))
    // probes scan their nprobe best cells only (sorted per row, map-only)
    val byScoreDesc =
      "(l, r) -> CASE WHEN l.s > r.s THEN -1 WHEN l.s < r.s THEN 1 WHEN l.c < r.c THEN -1 ELSE 1 END"
    val probeCells = emb.filter(col("vec_id") < 5).withColumn("C", cLit)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        explode(expr(s"transform(slice(array_sort($cellScores, $byScoreDesc), 1, $nprobe), x -> x.c)"))
          .as("cell"))
    // exact rerank inside the probed cells
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc_nulls_last, col("vec_id").asc_nulls_last)
    probeCells.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(SimilarityQueries.cosine("qv", "embedding"), 6))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
  }
}
