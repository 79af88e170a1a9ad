package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 E — window functions. Windows shuffle once on the
  * partition key and sort within partitions; every window here
  * partitions on a real key (never a global `Window.orderBy` with no
  * partitioning, which would serialize all data through one task —
  * the classic 100 TB failure mode). GROUPS frames and frame EXCLUDE
  * have no Spark support (documented omission, SURVEY §7).
  */
object WindowQueries extends QueryModule {

  /** Shared by e_rank_family and its banded twin — the twin must be
    * value-identical against the SAME oracle. */
  private val RankFamilyOracle =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
        row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk,
        round(percent_rank() OVER w, 6) AS prk, round(cume_dist() OVER w, 6) AS cd,
        ntile(4) OVER w AS quartile
        FROM orders WHERE o_totalprice > 450000.0
        WINDOW w AS (PARTITION BY o_orderstatus
          ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST)
        ORDER BY o_orderstatus ASC NULLS LAST, rn ASC NULLS LAST"""

  override val queries: Seq[Q] = Seq(
    Q("e_rank_family",
      "row_number/rank/dense_rank/percent_rank/cume_dist/ntile over a partitioned ordered window.",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
        T(s, dir, "orders")
          .filter(col("o_totalprice") > 450000.0)
          .withColumn("rn", row_number().over(w))
          .withColumn("rk", rank().over(w))
          .withColumn("drk", dense_rank().over(w))
          .withColumn("prk", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .withColumn("quartile", ntile(4).over(w))
          .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
            col("rn"), col("rk"), col("drk"), col("prk"), col("cd"), col("quartile"))
          .orderBy(col("o_orderstatus").asc_nulls_last, col("rn").asc_nulls_last)
      },
      Some(RankFamilyOracle)),

    Q("e_rank_family_banded",
      "Banded two-level-rank twin of e_rank_family (round-12 verdict #2: the plain form's window partitions on a 3-value key, capping the sort at 3 tasks at any cluster size). Value-identical against the SAME oracle, but every window here is keyed on (status, price-band) or (status, price): bands of the sort key give parallel per-band row_numbers, a broadcast running offset over the tiny (status x band) relation makes them global, the distinct-price relation gets the same treatment for dense_rank, tie aggregates derive rank/cume_dist, and ntile comes closed-form from (rn, n). Parallelism scales with the value range (the d_equidepth_hist machinery), not the partition-key cardinality.",
      (s, dir) => {
        val base = T(s, dir, "orders")
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        // DESC sort key: bands are walked descending; 1000-wide bands
        // give ~50 per status at any SF (range is fixture-bounded)
        val banded = base.withColumn("band",
          floor(col("o_totalprice") / lit(1000.0)).cast("long"))
        // running offset of rows in HIGHER bands, per status — a keyed
        // window over the O(status x bands) relation, never the data
        val offs = banded.groupBy(col("o_orderstatus"), col("band"))
          .agg(count(lit(1)).as("bn"))
          .withColumn("boff", coalesce(sum(col("bn")).over(
            Window.partitionBy(col("o_orderstatus"))
              .orderBy(col("band").desc_nulls_last)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("o_orderstatus"), col("band"), col("boff"))
        val perStatus = broadcast(base.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n")))
        val rn = banded.join(broadcast(offs), Seq("o_orderstatus", "band"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("o_orderstatus"), col("band"))
              .orderBy(col("o_totalprice").desc_nulls_last,
                col("o_orderkey").asc_nulls_last)).cast("long") + col("boff"))
        // the ORDER BY spec carries a UNIQUE tiebreak (o_orderkey), so
        // no two rows are peers: rank = dense_rank = row_number and
        // cume_dist = rn / n — the tie machinery collapses (SQL peers
        // are rows equal on ALL sort keys, not just the price)
        // ntile(4) closed-form: the first n%4 buckets take n div 4 + 1
        // rows (integer `div` — Spark's `/` on longs is double)
        rn.join(perStatus, Seq("o_orderstatus"))
          .withColumn("rk", col("rn"))
          .withColumn("drk", col("rn"))
          .withColumn("prk", when(col("n") > 1,
            round((col("rn") - 1).cast("double")
              / (col("n") - 1).cast("double"), 6)).otherwise(lit(0.0)))
          .withColumn("cd", round(col("rn").cast("double")
            / col("n").cast("double"), 6))
          .withColumn("q4", expr("n div 4"))
          .withColumn("r4", col("n") % 4)
          .withColumn("quartile", expr(
            "CASE WHEN rn <= r4 * (q4 + 1) THEN (rn - 1) div (q4 + 1) + 1 " +
              "ELSE r4 + (rn - 1 - r4 * (q4 + 1)) div q4 + 1 END"))
          .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
            col("rn"), col("rk"), col("drk"), col("prk"), col("cd"),
            col("quartile"))
          .orderBy(col("o_orderstatus").asc_nulls_last, col("rn").asc_nulls_last)
      },
      Some(RankFamilyOracle)),

    Q("e_lag_lead",
      "lag/lead with offsets and defaults over per-customer order history.",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc_nulls_last, col("o_orderkey").asc_nulls_last)
        T(s, dir, "orders")
          .filter(col("o_custkey") < 50)
          .withColumn("prev_price", round(lag(col("o_totalprice"), 1, 0.0).over(w), 2))
          .withColumn("next_price", round(lead(col("o_totalprice"), 1, 0.0).over(w), 2))
          .withColumn("prev2_key", lag(col("o_orderkey"), 2).over(w))
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("prev_price"), col("next_price"), col("prev2_key"))
          .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        round(lag(o_totalprice, 1, 0.0) OVER w, 2) AS prev_price,
        round(lead(o_totalprice, 1, 0.0) OVER w, 2) AS next_price,
        lag(o_orderkey, 2) OVER w AS prev2_key
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey
          ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST)
        ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    Q("e_first_last_nth",
      "first_value/last_value/nth_value with an explicit full-partition frame (the default last_value frame pitfall, SURVEY §2.2 E).",
      (s, dir) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal").desc_nulls_last, col("s_suppkey").asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T(s, dir, "supplier")
          .withColumn("best_supp", first(col("s_suppkey")).over(w))
          .withColumn("worst_supp", last(col("s_suppkey")).over(w))
          .withColumn("second_supp", nth_value(col("s_suppkey"), 2).over(w))
          .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
            col("best_supp"), col("worst_supp"), col("second_supp"))
          .orderBy(col("s_nationkey").asc_nulls_last, col("s_suppkey").asc_nulls_last)
      },
      Some("""SELECT s_nationkey, s_suppkey, s_acctbal,
        first_value(s_suppkey) OVER w AS best_supp,
        last_value(s_suppkey) OVER w AS worst_supp,
        nth_value(s_suppkey, 2) OVER w AS second_supp
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey
          ORDER BY s_acctbal DESC NULLS LAST, s_suppkey ASC NULLS LAST
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY s_nationkey ASC NULLS LAST, s_suppkey ASC NULLS LAST""")),

    Q("e_agg_window_rows",
      "Aggregates over ROWS frames: running total + trailing moving average.",
      (s, dir) => {
        val base = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc_nulls_last,
                   col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
        T(s, dir, "lineitem")
          .filter(col("l_suppkey") < 10)
          .withColumn("running_qty",
            round(sum(col("l_quantity")).over(base.rowsBetween(Window.unboundedPreceding, 0)), 2))
          .withColumn("ma3",
            round(avg(col("l_quantity")).over(base.rowsBetween(-2, 0)), 6))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("running_qty"), col("ma3"))
          .orderBy(col("l_suppkey").asc_nulls_last, col("l_orderkey").asc_nulls_last,
                   col("l_linenumber").asc_nulls_last)
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        round(sum(l_quantity) OVER (PARTITION BY l_suppkey
          ORDER BY l_shipdate ASC NULLS LAST, l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
        round(avg(l_quantity) OVER (PARTITION BY l_suppkey
          ORDER BY l_shipdate ASC NULLS LAST, l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
        FROM lineitem WHERE l_suppkey < 10
        ORDER BY l_suppkey ASC NULLS LAST, l_orderkey ASC NULLS LAST,
                 l_linenumber ASC NULLS LAST""")),

    Q("e_range_frame",
      "RANGE BETWEEN value-based frame over a numeric ordering key.",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("value"))
          .rangeBetween(-10L, 0L)
        T(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("event_id"), col("value"))
          .withColumn("n_within_10", count(lit(1)).over(w))
          .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
      },
      Some("""SELECT user_id, event_id, value,
        count(*) OVER (PARTITION BY user_id ORDER BY value
          RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS n_within_10
        FROM events WHERE user_id < 20
        ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""")),

    Q("e_groups_frame_rewrite",
      "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW via the dense_rank+RANGE rewrite (peer groups = equal dense_rank). Neither engine ships GROUPS frames (DuckDB 1.5: 'not implemented yet'), so both sides use the rewrite — it IS the portable realization.",
      (s, dir) => {
        val order = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_nationkey").asc_nulls_last)
        val overRank = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("dr").asc_nulls_last).rangeBetween(-1L, 0L)
        T(s, dir, "customer")
          .filter(col("c_custkey") < 300)
          .withColumn("dr", dense_rank().over(order))
          .withColumn("grp_sum", round(sum(col("c_acctbal")).over(overRank), 2))
          .withColumn("grp_n", count(lit(1)).over(overRank))
          .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
            col("grp_sum"), col("grp_n"))
          .orderBy(col("c_custkey").asc_nulls_last)
      },
      Some("""SELECT c_custkey, c_mktsegment, c_nationkey,
        round(sum(c_acctbal) OVER w2, 2) AS grp_sum,
        count(*) OVER w2 AS grp_n
        FROM (SELECT c_custkey, c_mktsegment, c_nationkey, c_acctbal,
                dense_rank() OVER (PARTITION BY c_mktsegment
                  ORDER BY c_nationkey ASC NULLS LAST) AS dr
              FROM customer WHERE c_custkey < 300) t
        WINDOW w2 AS (PARTITION BY c_mktsegment ORDER BY dr ASC NULLS LAST
          RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
        ORDER BY c_custkey ASC NULLS LAST""")),

    Q("e_qualify_topk_per_group",
      "DuckDB QUALIFY rewrite: top-3 orders per status via window + filter (SURVEY §7).",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
        T(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderstatus"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderstatus").asc_nulls_last, col("rn").asc_nulls_last)
      },
      Some("""SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST) AS rn
          FROM orders) t
        WHERE rn <= 3
        ORDER BY o_orderstatus ASC NULLS LAST, rn ASC NULLS LAST""")))
}
