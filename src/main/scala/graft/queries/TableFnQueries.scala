package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 I — table functions / relation producers, plus the
  * macro surface (the reference's only user-extension mechanism,
  * uquery-rs src/main.rs:413-450): a DuckDB scalar macro maps to a SQL
  * UDF, a table macro maps to a parameterized DataFrame factory —
  * which is exactly the shape of `SparkEntry.queries` itself.
  */
object TableFnQueries extends QueryModule {

  /** Table-macro equivalent: parameterized relation factory (ref:
    * `CREATE MACRO test() AS TABLE SELECT ...`, custom-database.md).
    */
  def topCustomersBySegment(s: SparkSession, dir: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey").asc_nulls_last)
    T(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
  }

  override val queries: Seq[Q] = Seq(
    Q("i_unnest_explode",
      "unnest(list) → explode: word frequencies from split documents (ref: response-formats.md unnest example).",
      (s, dir) =>
        T(s, dir, "documents")
          .filter(col("doc_id") < 200)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("freq").desc_nulls_last, col("word").asc_nulls_last),
      Some("""SELECT word, count(*) AS freq, count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents WHERE doc_id < 200) t
        GROUP BY word
        ORDER BY freq DESC NULLS LAST, word ASC NULLS LAST""")),

    Q("i_posexplode",
      "posexplode = unnest WITH ORDINALITY: word positions within a document.",
      (s, dir) =>
        T(s, dir, "documents")
          .filter(col("doc_id") < 20)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
          .withColumn("pos", col("pos") + 1)
          .orderBy(col("doc_id").asc_nulls_last, col("pos").asc_nulls_last),
      Some("""SELECT doc_id, CAST(pos AS INT) AS pos, word
        FROM (SELECT doc_id,
                unnest(string_split(text, ' ')) AS word,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
              FROM documents WHERE doc_id < 20)
        ORDER BY doc_id ASC NULLS LAST, pos ASC NULLS LAST""")),

    Q("i_generate_series",
      "generate_series/range → spark.range + sequence: per-row series expansion.",
      (s, dir) =>
        T(s, dir, "region")
          .select(col("r_regionkey"),
            explode(sequence(lit(0), col("r_regionkey"))).as("i"))
          .withColumn("sq", (col("i") * col("i")).cast("int"))
          .orderBy(col("r_regionkey").asc_nulls_last, col("i").asc_nulls_last),
      Some("""SELECT r_regionkey, CAST(i AS INT) AS i, CAST(i*i AS INT) AS sq
        FROM (SELECT r_regionkey, unnest(generate_series(0, r_regionkey)) AS i FROM region)
        ORDER BY r_regionkey ASC NULLS LAST, i ASC NULLS LAST""")),

    Q("i_pivot",
      "PIVOT → groupBy().pivot().agg() with explicit pivot values (no data-dependent scan at plan time — required at scale).",
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("F", "O", "P"))
          .orderBy(col("o_orderpriority").asc_nulls_last),
      Some("""SELECT o_orderpriority,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        FROM orders GROUP BY o_orderpriority
        ORDER BY o_orderpriority ASC NULLS LAST""")),

    Q("i_unpivot",
      "UNPIVOT → Dataset.unpivot (wide→long).",
      (s, dir) =>
        T(s, dir, "part")
          .filter(col("p_partkey") < 100)
          .select(col("p_partkey"), col("p_size").cast("double").as("size"),
            col("p_retailprice").as("retailprice"))
          .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
            "metric", "val")
          .orderBy(col("p_partkey").asc_nulls_last, col("metric").asc_nulls_last),
      Some("""SELECT p_partkey, metric, val FROM (
          SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
          FROM part WHERE p_partkey < 100
          UNION ALL
          SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val
          FROM part WHERE p_partkey < 100)
        ORDER BY p_partkey ASC NULLS LAST, metric ASC NULLS LAST""")),

    Q("i_cte",
      "WITH: chained CTEs referenced twice (SQL entry point).",
      (s, dir) => {
        T.views(s, dir, "orders", "customer")
        s.sql("""WITH cust_orders AS (
            SELECT o_custkey, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DECIMAL(20,2)) AS spent
            FROM orders GROUP BY o_custkey),
          seg_stats AS (
            SELECT c_mktsegment, round(avg(n_orders), 6) AS avg_orders,
                   round(CAST(sum(spent) AS DOUBLE), 2) AS seg_spent
            FROM customer JOIN cust_orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment)
          SELECT * FROM seg_stats
          ORDER BY c_mktsegment ASC NULLS LAST""")
      },
      Some("""WITH cust_orders AS (
          SELECT o_custkey, count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DECIMAL(20,2)) AS spent
          FROM orders GROUP BY o_custkey),
        seg_stats AS (
          SELECT c_mktsegment, round(avg(n_orders), 6) AS avg_orders,
                 round(CAST(sum(spent) AS DOUBLE), 2) AS seg_spent
          FROM customer JOIN cust_orders ON c_custkey = o_custkey
          GROUP BY c_mktsegment)
        SELECT * FROM seg_stats
        ORDER BY c_mktsegment ASC NULLS LAST""")),

    Q("i_recursive_cte",
      "WITH RECURSIVE (Spark ≥4.0): integer series with running product.",
      (s, _) =>
        s.sql("""WITH RECURSIVE fact(n, f) AS (
            SELECT 1, CAST(1 AS BIGINT)
            UNION ALL
            SELECT n + 1, f * (n + 1) FROM fact WHERE n < 10)
          SELECT n, f FROM fact ORDER BY n ASC NULLS LAST"""),
      Some("""WITH RECURSIVE fact(n, f) AS (
          SELECT 1, CAST(1 AS BIGINT)
          UNION ALL
          SELECT n + 1, f * (n + 1) FROM fact WHERE n < 10)
        SELECT n, f FROM fact ORDER BY n ASC NULLS LAST""")),

    Q("i_lateral_join",
      "JOIN LATERAL: per-region top-2 nations via correlated lateral subquery.",
      (s, dir) => {
        T.views(s, dir, "region", "nation")
        s.sql("""SELECT r_name, t.n_name
          FROM region, LATERAL (
            SELECT n_name FROM nation WHERE n_regionkey = r_regionkey
            ORDER BY n_name ASC NULLS LAST LIMIT 2) t
          ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""")
      },
      Some("""SELECT r_name, t.n_name
        FROM region, LATERAL (
          SELECT n_name FROM nation WHERE n_regionkey = r_regionkey
          ORDER BY n_name ASC NULLS LAST LIMIT 2) t
        ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""")),

    Q("i_scalar_macro",
      "DuckDB scalar macro → SQL UDF (CREATE FUNCTION … RETURN expr, Spark ≥4.0); oracle inlines the macro body as DuckDB would.",
      (s, dir) => {
        T.views(s, dir, "lineitem")
        // register-if-absent: OR REPLACE on a live session emits the
        // SimpleFunctionRegistry "replaced" WARN the bench-tail audit
        // forbids (round-9 invariant: any warn is a regression signal)
        if (!s.catalog.functionExists("disc_price"))
          s.sql("""CREATE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
                   RETURNS DOUBLE RETURN p * (1.0 - d)""")
        // exact-decimal accumulation (Exact.sumExact discipline): both engines
        // compute the same double per row, cast to the same DECIMAL(22,4), and
        // sum order-independently — immune to partial-sum-order drift.
        s.sql("""SELECT l_returnflag,
                   round(CAST(sum(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS rev
                 FROM lineitem GROUP BY l_returnflag
                 ORDER BY l_returnflag ASC NULLS LAST""")
      },
      Some("""SELECT l_returnflag,
          round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS rev
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag ASC NULLS LAST""")),

    Q("i_table_macro",
      "DuckDB table macro → parameterized DataFrame factory (top-N per segment, N=3).",
      (s, dir) =>
        topCustomersBySegment(s, dir, 3)
          .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_mktsegment").asc_nulls_last, col("rn").asc_nulls_last),
      Some("""SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
            row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS LAST) AS rn
          FROM customer) t
        WHERE rn <= 3
        ORDER BY c_mktsegment ASC NULLS LAST, rn ASC NULLS LAST""")),

    Q("i_summarize",
      "DuckDB SUMMARIZE → per-column profile (operators.SummaryProfile — Dataset.summary's semantics on raw catalyst aggregates, immune to session-registry name interception; round 15). Oracle-exempt: profile layout is engine-specific; twin=i_profile_portable (oracle-passing SQL-expressible profile).",
      (s, dir) =>
        graft.operators.SummaryProfile.of(
          T(s, dir, "lineitem")
            .select(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          Seq("count", "min", "max", "mean")),
      None),

    Q("i_sample_seeded",
      "USING SAMPLE → df.sample(seeded). Oracle-exempt: RNG streams are engine-specific; twin=i_sample_hash_split (oracle-passing deterministic hash-split sample); the spec asserts determinism across runs instead.",
      (s, dir) =>
        T(s, dir, "orders")
          .sample(withReplacement = false, fraction = 0.1, seed = 42L)
          .agg(count(lit(1)).as("n_sampled"),
               round(avg(col("o_totalprice")), 2).as("avg_price")),
      None))
}
