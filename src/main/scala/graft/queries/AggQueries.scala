package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 D — aggregation depth. All group-bys here are
  * hash aggregations with map-side partial aggregation (Catalyst
  * plans partial→final automatically); COUNT(DISTINCT) expands to a
  * two-phase expand+agg. Sketch-based aggregates (HLL) are declared
  * but oracle-exempt — sketches are engine-specific by construction.
  */
object AggQueries extends QueryModule {

  override val queries: Seq[Q] = Seq(
    Q("d_count_distinct",
      "COUNT(DISTINCT …), multiple distincts in one aggregation.",
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("o_custkey")).as("n_cust"),
            countDistinct(col("o_orderpriority")).as("n_prio"),
            countDistinct(col("o_custkey"), col("o_orderpriority")).as("n_cust_prio"))
          .orderBy(col("o_orderstatus").asc_nulls_last),
      Some("""SELECT o_orderstatus, count(*) AS n_rows,
        count(DISTINCT o_custkey) AS n_cust,
        count(DISTINCT o_orderpriority) AS n_prio,
        count(DISTINCT (o_custkey, o_orderpriority)) AS n_cust_prio
        FROM orders GROUP BY o_orderstatus
        ORDER BY o_orderstatus ASC NULLS LAST""")),

    Q("d_rollup",
      "GROUP BY ROLLUP with grouping_id() (SURVEY §2.2 D).",
      (s, dir) =>
        T(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), graft.Exact.sumExact(col("o_totalprice")).as("total"),
               grouping_id().as("gid"))
          .orderBy(col("gid").asc_nulls_last, col("o_orderstatus").asc_nulls_first,
                   col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE), 2) AS total,
        GROUPING(o_orderstatus, o_orderpriority) AS gid
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY gid ASC NULLS LAST, o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST""")),

    Q("d_cube",
      "GROUP BY CUBE over two dimensions.",
      (s, dir) =>
        // r15: project the 3 needed columns and spread before the CUBE
        // expand (×4 row fan-out + decimal casts ran on one core)
        T.spread(T(s, dir, "lineitem")
            .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")))
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), graft.Exact.sumExact(col("l_quantity")).as("qty"),
               grouping_id().as("gid"))
          .orderBy(col("gid").asc_nulls_last, col("l_returnflag").asc_nulls_first,
                   col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE), 2) AS qty,
        GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid ASC NULLS LAST, l_returnflag ASC NULLS FIRST,
                 l_linestatus ASC NULLS FIRST""")),

    Q("d_grouping_sets",
      "GROUP BY GROUPING SETS (SQL entry point — the reference's only API is SQL text).",
      (s, dir) => {
        T.views(s, dir, "customer")
        s.sql("""SELECT c_mktsegment, c_nationkey, count(*) AS n,
            round(CAST(sum(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE), 2) AS bal, grouping_id() AS gid
          FROM customer
          GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
          ORDER BY gid ASC NULLS LAST, c_mktsegment ASC NULLS FIRST,
                   c_nationkey ASC NULLS FIRST""")
      },
      Some("""SELECT c_mktsegment, c_nationkey, count(*) AS n,
        round(CAST(sum(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE), 2) AS bal,
        GROUPING(c_mktsegment, c_nationkey) AS gid
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY gid ASC NULLS LAST, c_mktsegment ASC NULLS FIRST,
                 c_nationkey ASC NULLS FIRST""")),

    Q("d_filter_clause",
      "Aggregate FILTER (WHERE …) clause (SQL ≥ Spark 3.0 / DuckDB native).",
      (s, dir) => {
        T.views(s, dir, "lineitem")
        s.sql("""SELECT l_returnflag,
            count(*) AS n,
            count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
            round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE), 2) AS rev_discounted,
            round(CAST(sum(CAST(l_tax AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) / count(*) FILTER (WHERE l_linestatus = 'F'), 6) AS avg_tax_f
          FROM lineitem GROUP BY l_returnflag
          ORDER BY l_returnflag ASC NULLS LAST""")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE), 2) AS rev_discounted,
        round(CAST(sum(CAST(l_tax AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) / count(*) FILTER (WHERE l_linestatus = 'F'), 6) AS avg_tax_f
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag ASC NULLS LAST""")),

    Q("d_stats",
      "Statistical aggregates: stddev/variance (samp+pop), corr, covar.",
      (s, dir) =>
        T(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
            round(stddev_pop(col("l_quantity")), 6).as("sdp_qty"),
            round(var_samp(col("l_extendedprice")), 4).as("var_price"),
            round(var_pop(col("l_extendedprice")), 4).as("varp_price"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"),
            round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covp_qp"))
          .orderBy(col("l_returnflag").asc_nulls_last),
      Some("""SELECT l_returnflag,
        round(stddev_samp(l_quantity), 6) AS sd_qty,
        round(stddev_pop(l_quantity), 6) AS sdp_qty,
        round(var_samp(l_extendedprice), 4) AS var_price,
        round(var_pop(l_extendedprice), 4) AS varp_price,
        round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp,
        round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag ASC NULLS LAST""")),

    Q("d_quantiles",
      "Exact quantiles: percentile_cont equivalents, scalar + array form; median.",
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            // ONE array-percentile aggregate (identical expressions dedupe to a
            // single sort) split into scalar columns: the driver's comparator
            // sorts pandas frames and cannot hash ndarray cells, so list-typed
            // outputs are not comparable.
            expr("round(percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))[1], 4)").as("median_price"),
            expr("round(percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))[0], 4)").as("q25"),
            expr("round(percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))[1], 4)").as("q50"),
            expr("round(percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))[2], 4)").as("q75"),
            expr("round(percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))[3], 4)").as("p90"))
          .orderBy(col("o_orderstatus").asc_nulls_last),
      Some("""SELECT o_orderstatus,
        round(quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9])[2], 4) AS median_price,
        round(quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9])[1], 4) AS q25,
        round(quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9])[2], 4) AS q50,
        round(quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9])[3], 4) AS q75,
        round(quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9])[4], 4) AS p90
        FROM orders GROUP BY o_orderstatus
        ORDER BY o_orderstatus ASC NULLS LAST""")),

    Q("d_minmax_by",
      "arg_min/arg_max → min_by/max_by (SURVEY §2.2 D).",
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            max_by(col("o_orderkey"), col("o_totalprice")).as("key_of_max"),
            min_by(col("o_orderkey"), col("o_totalprice")).as("key_of_min"),
            max(col("o_totalprice")).as("max_price"),
            min(col("o_totalprice")).as("min_price"))
          .orderBy(col("o_orderstatus").asc_nulls_last),
      Some("""SELECT o_orderstatus,
        arg_max(o_orderkey, o_totalprice) AS key_of_max,
        arg_min(o_orderkey, o_totalprice) AS key_of_min,
        max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
        FROM orders GROUP BY o_orderstatus
        ORDER BY o_orderstatus ASC NULLS LAST""")),

    Q("d_string_agg",
      "string_agg/listagg with deterministic ordering via sorted collect.",
      (s, dir) =>
        T(s, dir, "nation")
          .groupBy(col("n_regionkey"))
          .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
          .orderBy(col("n_regionkey").asc_nulls_last),
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey
        ORDER BY n_regionkey ASC NULLS LAST""")),

    Q("d_array_agg",
      "array_agg/list() with deterministic sort.",
      (s, dir) =>
        T(s, dir, "supplier")
          .groupBy(col("s_nationkey"))
          // collect_list is the operator under test; the final stringification exists
          // only because the driver's comparator cannot hash list-typed cells.
          .agg(concat_ws(",",
                 expr("transform(array_sort(collect_list(s_suppkey)), x -> cast(x as string))"))
                 .as("suppliers"),
               count(lit(1)).as("n"))
          .orderBy(col("s_nationkey").asc_nulls_last),
      Some("""SELECT s_nationkey,
        array_to_string(list_transform(list_sort(array_agg(s_suppkey)), x -> CAST(x AS VARCHAR)), ',') AS suppliers,
        count(*) AS n
        FROM supplier GROUP BY s_nationkey
        ORDER BY s_nationkey ASC NULLS LAST""")),

    Q("d_bit_bool_agg",
      "bit_and/bit_or/bit_xor + bool_and/bool_or aggregates.",
      (s, dir) =>
        T(s, dir, "nation")
          .groupBy(col("n_regionkey"))
          .agg(
            bit_and(col("n_nationkey")).as("band"),
            bit_or(col("n_nationkey")).as("bor"),
            bit_xor(col("n_nationkey")).as("bxor"),
            bool_and(col("n_nationkey") % 2 === 0).as("all_even"),
            bool_or(col("n_nationkey") % 2 === 0).as("any_even"))
          .orderBy(col("n_regionkey").asc_nulls_last),
      Some("""SELECT n_regionkey,
        bit_and(n_nationkey) AS band, bit_or(n_nationkey) AS bor,
        bit_xor(n_nationkey) AS bxor,
        bool_and(n_nationkey % 2 = 0) AS all_even,
        bool_or(n_nationkey % 2 = 0) AS any_even
        FROM nation GROUP BY n_regionkey
        ORDER BY n_regionkey ASC NULLS LAST""")),

    Q("d_histogram_buckets",
      "histogram() realized as deterministic width-bucket counts (map-typed histogram output is engine-specific; bucketed rows are portable).",
      (s, dir) =>
        T(s, dir, "events")
          .groupBy((floor(col("value") / 50.0) * 50).cast("long").as("bucket_lo"))
          .agg(count(lit(1)).as("n"), graft.Exact.avgExact(col("value")).as("avg_in_bucket"))
          .orderBy(col("bucket_lo").asc_nulls_last),
      Some("""SELECT CAST(floor(value / 50.0) * 50 AS BIGINT) AS bucket_lo,
        count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_in_bucket
        FROM events GROUP BY 1 ORDER BY bucket_lo ASC NULLS LAST""")),

    Q("d_any_value",
      "any_value/arbitrary — deterministic here because each group has exactly one distinct value.",
      (s, dir) =>
        T(s, dir, "customer")
          .groupBy(col("c_custkey"))
          .agg(any_value(col("c_mktsegment")).as("seg"))
          .filter(col("c_custkey") < 100)
          .orderBy(col("c_custkey").asc_nulls_last),
      Some("""SELECT c_custkey, any_value(c_mktsegment) AS seg FROM customer
        WHERE c_custkey < 100 GROUP BY c_custkey
        ORDER BY c_custkey ASC NULLS LAST""")),

    Q("d_approx_quantile",
      "approx_percentile (GK sketch) vs exact percentile — sketch estimates are engine-specific, so the declared output is the sanity envelope, not the estimate (SURVEY §2.2 D approx family).",
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_median"),
            expr("percentile(o_totalprice, 0.5)").as("exact_median"))
          .select(col("o_orderstatus"),
            (abs(col("approx_median") - col("exact_median")) / col("exact_median") < 0.05)
              .as("within_5pct"))
          .orderBy(col("o_orderstatus").asc_nulls_last),
      // the envelope (not the estimate) is deterministic → oracle-checkable
      Some("""SELECT o_orderstatus, TRUE AS within_5pct FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus ASC NULLS LAST""")),

    Q("d_approx_count_distinct",
      "approx_count_distinct (HLL sketch). The raw estimate is engine-specific, so the compared surface is the exact count plus the sketch-landed-within-10% boolean (true for any sane HLL at these cardinalities).",
      (s, dir) =>
        // r15: measured both ways — a spread here LOSES (1.5 s → 4.9 s):
        // round-robin repartition pays a local sort of the 600k rows
        // (SPARK-23207) that outweighs parallelizing the cheap
        // HLL+distinct partials. Left single-split deliberately.
        T(s, dir, "lineitem").select(col("l_partkey"))
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .select(col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")) / col("exact_parts") < 0.1)
              .as("within_10pct")),
      Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
        (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
           / CAST(count(DISTINCT l_partkey) AS DOUBLE) < 0.1) AS within_10pct
        FROM lineitem""")))
}
