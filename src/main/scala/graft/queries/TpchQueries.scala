package graft.queries

import graft.{Q, QueryModule, T}

/** TPC-H q2–q22 conformance battery (round-13 verdict ask #3).
  *
  * The public TPC-H spec queries, adapted to the driver's TPC-H-ish
  * fixtures (TESTDATA.md): the synthetic schema has no `partsupp`
  * table and omits several spec columns (l_commitdate/l_receiptdate,
  * l_shipmode/l_shipinstruct, p_container/p_mfgr, o_comment/
  * o_shippriority, c_phone/c_address), so each query keeps the SPEC'S
  * STRUCTURAL SHAPE — correlated EXISTS/NOT EXISTS (q4, q21, q22),
  * min-cost correlated subquery (q2), view-over-aggregate (q15),
  * nested aggregation (q11, q13, q18), OR-of-ANDs scan predicates
  * (q19), decimal discipline at realistic join fan-in (q3, q5, q9,
  * q10) — over the available columns:
  *   - partsupp is derived once per query as a CTE over lineitem
  *     (ps_supplycost = min unit price, ps_availqty = total quantity);
  *   - "late delivery" (l_receiptdate > l_commitdate) becomes
  *     l_tax > l_discount — same per-row selectivity class (~35%);
  *   - p_container/p_mfgr predicates become p_brand/p_size;
  *   - c_phone country codes become the last digit of c_name.
  *
  * Every query is declared via spark.sql over the SAME text the DuckDB
  * oracle runs (ANSI intersection, reference surface: full SQL SELECT
  * via POST /, uquery-rs src/core/duckdb.rs:87) — Catalyst plans the
  * joins, decorrelates the subqueries, and pushes the scan predicates;
  * nothing here is hand-scheduled.
  *
  * Scale notes (100 TB): every join is keyed (orderkey/partkey/
  * suppkey/custkey → shuffle-hash or broadcast for the dims);
  * correlated EXISTS/IN decorrelate to semi/anti hash joins on the
  * same keys; partsupp-from-lineitem is one partial→final aggregate;
  * the only global barriers are the spec's own ORDER BY ... LIMIT
  * heads, which plan as TakeOrderedAndProject.
  */
object TpchQueries extends QueryModule {

  private val AllTables =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** One shared ANSI text: Spark executes it via spark.sql (library
    * session, builtin-pure) and the driver re-runs it in DuckDB. */
  private def tq(name: String, doc: String, text: String): Q =
    // r15: measured THREE ways in one session (min-of-3 battery sum at
    // sf0.1/32c): plain views 15.3 s, spread views hashed on the table
    // id 18.8 s, spread views hashed on all columns 24.9 s. The spec
    // shapes join/aggregate with map-side partials immediately, so any
    // pre-exchange is pure added cost — plain views stays.
    Q(name, doc, (s, dir) => { T.views(s, dir, AllTables: _*); s.sql(text) },
      Some(text))

  /** The derived partsupp relation: the spec's (partkey, suppkey)
    * catalog reconstructed from observed lineitems. min() over the raw
    * per-row division keeps both engines on identical doubles; the
    * quantity sum is integral-in-double, so the BIGINT cast is exact. */
  private val PartsuppCte =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         round(min(l_extendedprice / l_quantity), 6) AS ps_supplycost,
      |         CAST(sum(l_quantity) AS BIGINT) AS ps_availqty
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  override val queries: Seq[Q] = Seq(
    tq("tpch_q02",
      "TPC-H q2 minimum-cost supplier: correlated scalar MIN subquery over the derived partsupp, 4-way dim join, top-100.",
      s"""WITH $PartsuppCte
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
         |FROM part
         |JOIN partsupp ON p_partkey = ps_partkey
         |JOIN supplier ON s_suppkey = ps_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE p_size = 15 AND r_name = 'EUROPE'
         |  AND ps_supplycost = (
         |    SELECT min(ps2.ps_supplycost)
         |    FROM partsupp ps2
         |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
         |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
         |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC NULLS LAST, n_name ASC NULLS LAST,
         |  s_name ASC NULLS LAST, p_partkey ASC NULLS LAST
         |LIMIT 100""".stripMargin),

    tq("tpch_q03",
      "TPC-H q3 shipping priority: 3-way join, revenue agg, top-10 by revenue.",
      """SELECT l_orderkey,
        |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC NULLS LAST, o_orderdate ASC NULLS LAST,
        |  l_orderkey ASC NULLS LAST
        |LIMIT 10""".stripMargin),

    tq("tpch_q04",
      "TPC-H q4 order priority checking: correlated EXISTS semi-join (late-delivery proxy: l_tax > l_discount).",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_tax > l.l_discount)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin),

    tq("tpch_q05",
      "TPC-H q5 local supplier volume: 6-way join with the c_nationkey = s_nationkey locality constraint.",
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS LAST""".stripMargin),

    tq("tpch_q06",
      "TPC-H q6 forecasting revenue change: tight scan predicate, single global aggregate.",
      """SELECT round(CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(22,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin),

    tq("tpch_q07",
      "TPC-H q7 volume shipping: symmetric nation-pair predicate, year extraction, 4-way join.",
      """SELECT supp_nation, cust_nation, l_year,
        |  round(CAST(sum(CAST(volume AS DECIMAL(22,4))) AS DOUBLE), 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation ASC NULLS LAST, cust_nation ASC NULLS LAST,
        |  l_year ASC NULLS LAST""".stripMargin),

    tq("tpch_q08",
      "TPC-H q8 national market share: CASE-gated share of a two-year volume, 8-way join.",
      """SELECT o_year,
        |  round(CAST(sum(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(22,4))) AS DOUBLE)
        |    / CAST(sum(CAST(volume AS DECIMAL(22,4))) AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year ASC NULLS LAST""".stripMargin),

    tq("tpch_q09",
      "TPC-H q9 product type profit: derived-partsupp cost join, profit expression, nation x year rollup.",
      s"""WITH $PartsuppCte
         |SELECT nation, o_year,
         |  round(CAST(sum(CAST(amount AS DECIMAL(24,6))) AS DOUBLE), 2) AS sum_profit
         |FROM (
         |  SELECT n_name AS nation,
         |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         |    l_extendedprice*(1-l_discount) - ps_supplycost*l_quantity AS amount
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN partsupp ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%red%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation ASC NULLS LAST, o_year DESC NULLS LAST""".stripMargin),

    tq("tpch_q10",
      "TPC-H q10 returned item reporting: quarter window, returnflag filter, top-20 customers by lost revenue.",
      """SELECT c_custkey, c_name,
        |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS revenue,
        |  c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS LAST
        |LIMIT 20""".stripMargin),

    tq("tpch_q11",
      "TPC-H q11 important stock identification: HAVING against an uncorrelated scalar-subquery fraction of the total.",
      s"""WITH $PartsuppCte
         |SELECT ps_partkey,
         |  round(CAST(sum(CAST(ps_supplycost*ps_availqty AS DECIMAL(28,6))) AS DOUBLE), 2) AS part_value
         |FROM partsupp
         |JOIN supplier ON ps_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_5'
         |GROUP BY ps_partkey
         |HAVING CAST(sum(CAST(ps_supplycost*ps_availqty AS DECIMAL(28,6))) AS DOUBLE) > (
         |  SELECT CAST(sum(CAST(ps_supplycost*ps_availqty AS DECIMAL(28,6))) AS DOUBLE) * 0.001
         |  FROM partsupp
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_5')
         |ORDER BY part_value DESC NULLS LAST, ps_partkey ASC NULLS LAST""".stripMargin),

    tq("tpch_q12",
      "TPC-H q12 shipping modes / critical orders: CASE-split priority counts over late-shipped lines (shipdate > orderdate + 60 days).",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL '60' DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin),

    tq("tpch_q13",
      "TPC-H q13 customer order-count distribution: left outer join with an ON-clause residual, two-level aggregation.",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin),

    tq("tpch_q14",
      "TPC-H q14 promotion effect: CASE-gated revenue share over one month.",
      """SELECT round(100.0 *
        |    CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END AS DECIMAL(22,4))) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,4))) AS DOUBLE), 6) AS promo_revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin),

    tq("tpch_q15",
      "TPC-H q15 top supplier: view-over-aggregate (CTE referenced twice) with a MAX scalar subquery.",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier
        |JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey ASC NULLS LAST""".stripMargin),

    tq("tpch_q16",
      "TPC-H q16 parts/supplier relationship: NOT IN anti-join against flagged suppliers, COUNT DISTINCT rollup.",
      s"""WITH $PartsuppCte
         |SELECT p_brand, p_type, p_size,
         |  count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp
         |JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#4'
         |  AND p_type NOT LIKE 'MEDIUM%'
         |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC NULLS LAST, p_brand ASC NULLS LAST,
         |  p_type ASC NULLS LAST, p_size ASC NULLS LAST""".stripMargin),

    tq("tpch_q17",
      "TPC-H q17 small-quantity-order revenue: per-part correlated AVG threshold (decimal-exact on both engines).",
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
        |FROM lineitem l
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#4' AND p_size < 5
        |  AND l_quantity < (
        |    SELECT 0.5 * CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin),

    tq("tpch_q18",
      "TPC-H q18 large volume customer: IN over a HAVING-filtered aggregate, re-aggregated at order grain.",
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderdate ASC NULLS LAST,
        |  o_orderkey ASC NULLS LAST
        |LIMIT 100""".stripMargin),

    tq("tpch_q19",
      "TPC-H q19 discounted revenue: disjunction of brand/size/quantity conjunctions over the part join.",
      """SELECT round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#16' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin),

    tq("tpch_q20",
      "TPC-H q20 potential part promotion: nested IN chains with a doubly-correlated quantity-sum threshold.",
      s"""WITH $PartsuppCte
         |SELECT s_name, s_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_7'
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM partsupp
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
         |      AND ps_availqty > (
         |        SELECT 0.5 * CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |        FROM lineitem l
         |        WHERE l.l_partkey = ps_partkey AND l.l_suppkey = ps_suppkey
         |          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
         |          AND l.l_shipdate < TIMESTAMP '1997-01-01'))
         |ORDER BY s_name ASC NULLS LAST""".stripMargin),

    tq("tpch_q21",
      "TPC-H q21 suppliers who kept orders waiting: EXISTS + NOT EXISTS double correlation with inequality predicates (late proxy: l_tax > l_discount).",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_tax > l1.l_discount
        |  AND n_name = 'NATION_2'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_tax > l3.l_discount)
        |GROUP BY s_name
        |ORDER BY numwait DESC NULLS LAST, s_name ASC NULLS LAST
        |LIMIT 100""".stripMargin),

    tq("tpch_q22",
      "TPC-H q22 global sales opportunity: uncorrelated AVG threshold + NOT EXISTS anti-join (country code = last digit of c_name).",
      """SELECT cntrycode, count(*) AS numcust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
        |FROM (
        |  SELECT substr(c_name, length(c_name), 1) AS cntrycode, c_acctbal
        |  FROM customer c
        |  WHERE substr(c_name, length(c_name), 1) IN ('1', '3', '5', '7', '9')
        |    AND c_acctbal > (
        |      SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |      FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |    AND NOT EXISTS (
        |      SELECT 1 FROM orders o
        |      WHERE o.o_custkey = c.c_custkey
        |        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |) custsale
        |GROUP BY cntrycode
        |ORDER BY cntrycode ASC NULLS LAST""".stripMargin))
}
