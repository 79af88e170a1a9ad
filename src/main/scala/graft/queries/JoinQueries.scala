package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 C — the join surface (all delegated to DuckDB in the
  * reference, declared logically here; Catalyst picks the physical
  * strategy).
  *
  * Scale notes: dimension tables (region/nation/supplier, and customer
  * up to ~GBs) are explicitly `broadcast()` so the fact-side scan never
  * shuffles for them; only fact⋈fact joins (orders⋈lineitem) shuffle,
  * on their join key, and AQE handles skew. The theta join pre-filters
  * both sides before the quadratic BNLJ — at 100 TB an inequality join
  * must always be banded/bucketed first, and the pre-filter here is
  * that discipline in miniature.
  */
object JoinQueries extends QueryModule {

  override val queries: Seq[Q] = Seq(
    Q("c_join_inner_5way",
      "Inner equi-join chain customer⋈orders⋈lineitem⋈nation⋈region with broadcast dims; revenue per region/nation (TPC-H-Q5-shaped).",
      (s, dir) => {
        val cust = T(s, dir, "customer")
        val ord = T(s, dir, "orders")
        // r15: project + spread the fact side — the whole broadcast-join
        // probe chain and the decimal partial agg fused into the
        // single-split lineitem scan (one core) otherwise (guide §2.5)
        val li = T.spread(T(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
        val nat = T(s, dir, "nation")
        val reg = T(s, dir, "region")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            graft.Exact.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("r_name").asc_nulls_last, col("n_name").asc_nulls_last)
      },
      Some("""SELECT r_name, n_name,
        round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS revenue,
        count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""")),

    Q("c_join_left_outer",
      "LEFT OUTER join orders→high-value lineitem; count matched vs total per status.",
      (s, dir) => {
        val ord = T(s, dir, "orders")
        val li = T(s, dir, "lineitem").filter(col("l_extendedprice") > 90000.0)
        ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_outer")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_rows"), count(col("l_orderkey")).as("n_matched"))
          .orderBy(col("o_orderstatus").asc_nulls_last)
      },
      Some("""SELECT o_orderstatus, count(*) AS n_rows, count(l_orderkey) AS n_matched
        FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_extendedprice > 90000.0) li
          ON o_orderkey = li.l_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus ASC NULLS LAST""")),

    Q("c_join_right_outer",
      "RIGHT OUTER join (filtered lineitem)→orders; nulls on the left side.",
      (s, dir) => {
        val ord = T(s, dir, "orders")
        val li = T(s, dir, "lineitem").filter(col("l_quantity") >= 48.0)
        li.join(ord, li("l_orderkey") === ord("o_orderkey"), "right_outer")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_rows"), count(col("l_orderkey")).as("n_matched"))
          .orderBy(col("o_orderpriority").asc_nulls_last)
      },
      Some("""SELECT o_orderpriority, count(*) AS n_rows, count(li.l_orderkey) AS n_matched
        FROM (SELECT * FROM lineitem WHERE l_quantity >= 48.0) li
        RIGHT JOIN orders ON li.l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority ASC NULLS LAST""")),

    Q("c_join_full_outer",
      "FULL OUTER join of two disjoint-ish filtered sides; count null sides.",
      (s, dir) => {
        val rich = T(s, dir, "customer").filter(col("c_acctbal") > 8000.0)
          .select(col("c_custkey"), col("c_acctbal"))
        val big = T(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
          .select(col("o_custkey"), col("o_totalprice"))
        rich.join(big, rich("c_custkey") === big("o_custkey"), "full_outer")
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("c_custkey")).as("n_left"),
            count(col("o_custkey")).as("n_right"),
            sum(when(col("c_custkey").isNull, 1).otherwise(0)).as("n_left_null"),
            sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("n_right_null"))
      },
      Some("""SELECT count(*) AS n_rows, count(c_custkey) AS n_left,
        count(o_custkey) AS n_right,
        CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_null,
        CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_null
        FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000.0) c
        FULL JOIN (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0) o
          ON c.c_custkey = o.o_custkey""")),

    Q("c_join_semi",
      "LEFT SEMI join = EXISTS: customers having at least one open order.",
      (s, dir) => {
        val cust = T(s, dir, "customer")
        val ord = T(s, dir, "orders").filter(col("o_orderstatus") === "O")
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey").asc_nulls_last)
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey ASC NULLS LAST""")),

    Q("c_join_anti",
      "LEFT ANTI join = NOT EXISTS: customers with no urgent order.",
      (s, dir) => {
        val cust = T(s, dir, "customer")
        val ord = T(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_custkey").asc_nulls_last)
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey ASC NULLS LAST""")),

    Q("c_join_cross",
      "CROSS join region×nation (tiny×tiny only — a cross join of two fact tables is never acceptable at scale).",
      (s, dir) => {
        val reg = T(s, dir, "region").select(col("r_name"))
        val nat = T(s, dir, "nation").select(col("n_name"))
        reg.crossJoin(nat)
          .select(concat_ws("-", col("r_name"), col("n_name")).as("pair"))
          .orderBy(col("pair").asc_nulls_last)
      },
      Some("""SELECT concat(r_name, '-', n_name) AS pair FROM region CROSS JOIN nation
        ORDER BY pair ASC NULLS LAST""")),

    Q("c_join_theta_range",
      "Inequality (theta) join with pre-filtered sides: part price within a supplier-derived band.",
      (s, dir) => {
        // r15: spread the stream side of the banded BNLJ (guide §2.5)
        val p = T.spread(T(s, dir, "part").filter(col("p_size") > 45)
          .select(col("p_partkey"), col("p_retailprice")))
        val sup = T(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_acctbal"))
        p.join(sup,
            p("p_retailprice").between(sup("s_acctbal") / 10.0, sup("s_acctbal") / 2.0))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_parts"),
               graft.Exact.sumExact(col("p_retailprice")).as("sum_price"))
          .orderBy(col("s_suppkey").asc_nulls_last)
      },
      Some("""SELECT s_suppkey, count(*) AS n_parts, round(CAST(sum(CAST(p_retailprice AS DECIMAL(20,2))) AS DOUBLE), 2) AS sum_price
        FROM (SELECT p_partkey, p_retailprice FROM part WHERE p_size > 45) p
        JOIN supplier ON p.p_retailprice BETWEEN s_acctbal/10.0 AND s_acctbal/2.0
        GROUP BY s_suppkey ORDER BY s_suppkey ASC NULLS LAST""")),

    Q("c_join_using",
      "JOIN USING(key): single shared key column in output (DuckDB USING/NATURAL form).",
      (s, dir) => {
        val cust = T(s, dir, "customer").withColumnRenamed("c_nationkey", "nationkey")
        val nat = T(s, dir, "nation").withColumnRenamed("n_nationkey", "nationkey")
        cust.join(broadcast(nat), Seq("nationkey"))
          .groupBy(col("nationkey"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"))
          .orderBy(col("nationkey").asc_nulls_last)
      },
      Some("""SELECT c_nationkey AS nationkey, n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY c_nationkey, n_name ORDER BY nationkey ASC NULLS LAST""")))
}
