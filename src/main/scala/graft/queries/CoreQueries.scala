package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 B (projection / filter / predicates) + the flagship
  * scan→filter→project→agg→sort pipeline (§7 step 1).
  *
  * Scale notes: every query here is a single-table pipeline — filter
  * and projection reach the parquet scan (PushedFilters/ReadSchema,
  * asserted in PlanSpec), aggregation is partial→final (map-side
  * combine), and sort-limit plans as TakeOrderedAndProject. Nothing
  * materializes on the driver; all shapes scale linearly with input.
  */
object CoreQueries extends QueryModule {

  /** TPC-H-Q1-shaped pricing summary: the flagship slice. */
  def q1(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // r15 optimization (guide §1.2/§2.5): the per-row double→decimal
    // casts and decimal partial sums were fused into the single-split
    // scan stage (one core did all 600k rows — measured 2.25 s at
    // sf0.1); project the 6 needed columns, spread, and aggregate in
    // parallel (1.44 s). The exact decimal sums are order-independent,
    // so the result is bit-identical. Each column's decimal sum is
    // also computed ONCE and shared between its sum_* and avg_*
    // outputs (the (20,2) and (18,2) sums of the same column are the
    // same exact value, hence the same double after the cast).
    val base = T.spread(T(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus")))
    base
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(20, 2))).as("_sq"),
        sum(col("l_extendedprice").cast(DecimalType(20, 2))).as("_sp"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(22, 4))).as("_sdp"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .cast(DecimalType(24, 6))).as("_sc"),
        sum(col("l_discount").cast(DecimalType(20, 2))).as("_sd"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("_sq").cast("double"), 2).as("sum_qty"),
        round(col("_sp").cast("double"), 2).as("sum_base_price"),
        round(col("_sdp").cast("double"), 2).as("sum_disc_price"),
        round(col("_sc").cast("double"), 2).as("sum_charge"),
        round(col("_sq").cast("double") / col("count_order"), 6).as("avg_qty"),
        round(col("_sp").cast("double") / col("count_order"), 6).as("avg_price"),
        round(col("_sd").cast("double") / col("count_order"), 6).as("avg_disc"),
        col("count_order"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
  }

  override val queries: Seq[Q] = Seq(
    Q("q1_pricing_summary",
      "Flagship: scan→filter→project→groupBy agg→sort on lineitem (ref surface: full SQL SELECT via POST /, uquery-rs src/core/duckdb.rs:87).",
      q1,
      Some("""SELECT l_returnflag, l_linestatus,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE), 2) AS sum_qty,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE), 2) AS sum_base_price,
        round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS sum_disc_price,
        round(CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(24,6))) AS DOUBLE), 2) AS sum_charge,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""")),

    Q("b_project_expr",
      "SELECT list: aliases, arithmetic, string expr, CASE (SURVEY §2.2 B row 1).",
      (s, dir) =>
        T(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_uc"),
            concat_ws("/", col("p_type"), col("p_name")).as("type_name"),
            round(col("p_retailprice") * lit(1.1), 2).as("inflated"),
            when(col("p_size") < 20, lit("small"))
              .when(col("p_size") < 40, lit("medium"))
              .otherwise(lit("large")).as("size_class"))
          .orderBy(col("p_partkey").asc_nulls_last),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_uc,
        concat(p_type, '/', p_name) AS type_name,
        round(p_retailprice * 1.1, 2) AS inflated,
        CASE WHEN p_size < 20 THEN 'small' WHEN p_size < 40 THEN 'medium'
             ELSE 'large' END AS size_class
        FROM part ORDER BY p_partkey ASC NULLS LAST""")),

    Q("b_filter_predicates",
      "WHERE boolean calculus: IN, BETWEEN, LIKE, IS NOT NULL, AND/OR/NOT (SURVEY §2.2 B).",
      (s, dir) =>
        T(s, dir, "orders")
          .filter(
            col("o_orderstatus").isin("O", "F") &&
            col("o_totalprice").between(1000.0, 200000.0) &&
            (col("o_orderpriority").like("%URGENT%") || col("o_orderpriority").startsWith("2")) &&
            col("o_orderdate").isNotNull &&
            !(col("o_custkey") % 97 === 0))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
          .orderBy(col("o_orderkey").asc_nulls_last),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus IN ('O','F')
          AND o_totalprice BETWEEN 1000.0 AND 200000.0
          AND (o_orderpriority LIKE '%URGENT%' OR o_orderpriority LIKE '2%')
          AND o_orderdate IS NOT NULL
          AND NOT (o_custkey % 97 = 0)
        ORDER BY o_orderkey ASC NULLS LAST""")),

    Q("b_case_cast_null_fns",
      "CASE/CAST/TRY_CAST/COALESCE/NULLIF/GREATEST/LEAST. Note: raw CAST(double AS INT) truncates in Spark but rounds in DuckDB — use explicit floor/round on both sides.",
      (s, dir) =>
        T(s, dir, "customer")
          .select(
            col("c_custkey"),
            floor(col("c_acctbal")).cast("long").as("bal_floor"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)")).as("seg_or_none"),
            greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
            least(col("c_custkey"), lit(1000L)).as("key_capped"),
            expr("try_cast(replace(c_name, 'Customer#', '') AS BIGINT)").as("name_num"),
            expr("try_cast(c_mktsegment AS BIGINT)").as("seg_num"))
          .orderBy(col("c_custkey").asc_nulls_last),
      Some("""SELECT c_custkey,
        CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
        coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_or_none,
        greatest(c_acctbal, 0.0) AS bal_pos,
        least(c_custkey, 1000) AS key_capped,
        TRY_CAST(replace(c_name, 'Customer#', '') AS BIGINT) AS name_num,
        TRY_CAST(c_mktsegment AS BIGINT) AS seg_num
        FROM customer ORDER BY c_custkey ASC NULLS LAST""")),

    Q("b_star_exclude_replace",
      "DuckDB `SELECT * EXCLUDE(...) REPLACE(...)` star extension → df.drop + withColumn (SURVEY §2.2 B).",
      (s, dir) =>
        T(s, dir, "part")
          .drop("p_type", "p_name")
          .withColumn("p_retailprice", round(col("p_retailprice") * 0.9, 2))
          .orderBy(col("p_partkey").asc_nulls_last),
      Some("""SELECT p_partkey, p_brand, p_size,
        round(p_retailprice * 0.9, 2) AS p_retailprice
        FROM part ORDER BY p_partkey ASC NULLS LAST""")),

    Q("b_columns_regex",
      "DuckDB COLUMNS('regex') star extension → name-filtered df.columns projection (SURVEY §2.2 B).",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        val picked = li.columns.filter(_.matches("^l_(quantity|discount|tax)$")).sorted
        li.select((Seq(col("l_orderkey"), col("l_linenumber")) ++ picked.map(col)): _*)
          .filter(col("l_orderkey") < 100)
          .orderBy(col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_discount, l_quantity, l_tax
        FROM lineitem WHERE l_orderkey < 100
        ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST""")),

    Q("h_typeof",
      "typeof() realized from the resolved schema (Spark types normalized to DuckDB names; oracle uses native typeof).",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        def duckName(c: String): String = li.schema(c).dataType.sql match {
          case "STRING" => "VARCHAR"
          case "INT" => "INTEGER"
          // DuckDB's TIMESTAMP is timezone-naive = Spark's TIMESTAMP_NTZ
          case "TIMESTAMP_NTZ" => "TIMESTAMP"
          case other => other // BIGINT, DOUBLE, TIMESTAMP align
        }
        li.limit(1).select(
          lit(duckName("l_orderkey")).as("t_key"),
          lit(duckName("l_linenumber")).as("t_line"),
          lit(duckName("l_extendedprice")).as("t_price"),
          lit(duckName("l_returnflag")).as("t_flag"),
          lit(duckName("l_shipdate")).as("t_ship"))
      },
      Some("""SELECT typeof(l_orderkey) AS t_key, typeof(l_linenumber) AS t_line,
        typeof(l_extendedprice) AS t_price, typeof(l_returnflag) AS t_flag,
        typeof(l_shipdate) AS t_ship
        FROM lineitem LIMIT 1""")),

    Q("b_distinct",
      "DISTINCT over a projection (SURVEY §2.2 B).",
      (s, dir) =>
        T(s, dir, "orders")
          .select(col("o_orderstatus"), col("o_orderpriority"))
          .distinct()
          .orderBy(col("o_orderstatus").asc_nulls_last, col("o_orderpriority").asc_nulls_last),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        ORDER BY o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST""")),

    Q("b_distinct_on",
      "DuckDB DISTINCT ON(seg) → row_number() over (partition by seg order by ...) = 1 (SURVEY §2.2 B).",
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey").asc_nulls_last)
        T(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_mktsegment").asc_nulls_last)
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS LAST) AS rn
          FROM customer) t
        WHERE rn = 1 ORDER BY c_mktsegment ASC NULLS LAST""")),

    Q("a_values_inline",
      "Inline VALUES relation with named columns (ref: src/main.rs:152, docker_smoke_test.sh:121).",
      (s, _) =>
        s.sql("""SELECT Id, Name, Description
                 FROM VALUES (1, 'Rust', 'Safe, concurrent, performant systems language'),
                             (2, 'Scala', 'JVM functional-OO hybrid')
                 AS Language(Id, Name, Description)
                 ORDER BY Id ASC NULLS LAST"""),
      Some("""SELECT * FROM (VALUES
          (1, 'Rust', 'Safe, concurrent, performant systems language'),
          (2, 'Scala', 'JVM functional-OO hybrid')) AS Language(Id, Name, Description)
        ORDER BY Id ASC NULLS LAST""")))
}
