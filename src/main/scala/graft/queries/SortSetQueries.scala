package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 F (sorts/limits/top-k) + G (set operations).
  *
  * Scale notes: ORDER BY+LIMIT plans as TakeOrderedAndProject — each
  * partition keeps a k-heap, the driver merges k·numPartitions rows;
  * no global sort materializes. Set ops are shuffle-on-key; the
  * *All variants keep duplicates so Catalyst plans them as unions /
  * anti-joins with counts rather than distinct aggregations.
  */
object SortSetQueries extends QueryModule {

  override val queries: Seq[Q] = Seq(
    Q("f_order_limit_offset",
      "Multi-key ORDER BY with explicit null ordering + LIMIT/OFFSET (SURVEY §2.2 F; divergence note: DuckDB defaults NULLS LAST, Spark NULLS FIRST).",
      (s, dir) =>
        T(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
          .offset(10).limit(50),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
        LIMIT 50 OFFSET 10""")),

    Q("f_topk",
      "Top-k = ORDER BY … LIMIT k → TakeOrderedAndProject (per-partition heap, no global sort).",
      (s, dir) =>
        T(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc_nulls_last,
                   col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
          .limit(20),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey ASC NULLS LAST,
                 l_linenumber ASC NULLS LAST
        LIMIT 20""")),

    Q("f_sort_nulls_mixed",
      "NULLS FIRST vs NULLS LAST on a synthesized nullable key.",
      (s, dir) =>
        T(s, dir, "customer")
          .select(col("c_custkey"),
            when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal_or_null"))
          .orderBy(col("bal_or_null").desc_nulls_first, col("c_custkey").asc_nulls_last)
          .limit(100),
      Some("""SELECT c_custkey,
          CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
        FROM customer
        ORDER BY bal_or_null DESC NULLS FIRST, c_custkey ASC NULLS LAST
        LIMIT 100""")),

    Q("g_union_all",
      "UNION ALL keeps duplicates (SURVEY §2.2 G).",
      (s, dir) => {
        val big = T(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"), col("o_totalprice"))
        val urgent = T(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"), col("o_totalprice"))
        big.union(urgent)
          .orderBy(col("o_orderkey").asc_nulls_last, col("o_totalprice").asc_nulls_last)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000.0
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000.0
        ORDER BY o_orderkey ASC NULLS LAST, o_totalprice ASC NULLS LAST""")),

    Q("g_union_distinct",
      "UNION (distinct) deduplicates across the two sides.",
      (s, dir) => {
        val a = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey"))
        val b = T(s, dir, "customer").filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_nationkey"))
        a.union(b).distinct().orderBy(col("c_nationkey").asc_nulls_last)
      },
      Some("""SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        ORDER BY c_nationkey ASC NULLS LAST""")),

    Q("g_union_by_name",
      "DuckDB UNION ALL BY NAME → df.unionByName (column-order-insensitive union).",
      (s, dir) => {
        val a = T(s, dir, "nation").select(col("n_name").as("name"), col("n_nationkey").as("key"))
        val b = T(s, dir, "region").select(col("r_regionkey").as("key"), col("r_name").as("name"))
        a.unionByName(b)
          .orderBy(col("name").asc_nulls_last, col("key").asc_nulls_last)
      },
      Some("""SELECT n_name AS name, n_nationkey AS key FROM nation
        UNION ALL BY NAME
        SELECT r_regionkey AS key, r_name AS name FROM region
        ORDER BY name ASC NULLS LAST, key ASC NULLS LAST""")),

    Q("g_intersect",
      "INTERSECT (distinct): nations present in both segments' customer bases.",
      (s, dir) => {
        val a = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey"))
        val b = T(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
          .select(col("c_nationkey"))
        a.intersect(b).orderBy(col("c_nationkey").asc_nulls_last)
      },
      Some("""SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_nationkey FROM customer WHERE c_acctbal > 9000.0
        ORDER BY c_nationkey ASC NULLS LAST""")),

    Q("g_intersect_all",
      "INTERSECT ALL: multiplicity = min of the two sides' duplicate counts.",
      (s, dir) => {
        val a = T(s, dir, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"))
        val b = T(s, dir, "orders").filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(col("o_custkey"))
        a.intersectAll(b)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("multiplicity"))
          .orderBy(col("o_custkey").asc_nulls_last)
      },
      Some("""SELECT o_custkey, count(*) AS multiplicity FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT ALL
          SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
        GROUP BY o_custkey ORDER BY o_custkey ASC NULLS LAST""")),

    Q("g_except",
      "EXCEPT (distinct): nations with BUILDING customers but no 9k+ balance.",
      (s, dir) => {
        val a = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey"))
        val b = T(s, dir, "customer").filter(col("c_acctbal") > 9950.0)
          .select(col("c_nationkey"))
        a.except(b).orderBy(col("c_nationkey").asc_nulls_last)
      },
      Some("""SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT c_nationkey FROM customer WHERE c_acctbal > 9950.0
        ORDER BY c_nationkey ASC NULLS LAST""")),

    Q("g_except_all",
      "EXCEPT ALL: multiplicity-aware difference.",
      (s, dir) => {
        val a = T(s, dir, "orders").select(col("o_custkey"))
        val b = T(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey"))
        a.exceptAll(b)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("multiplicity"))
          .orderBy(col("o_custkey").asc_nulls_last)
      },
      Some("""SELECT o_custkey, count(*) AS multiplicity FROM (
          SELECT o_custkey FROM orders
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY o_custkey ORDER BY o_custkey ASC NULLS LAST""")))
}
