package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2.2 rows: subquery shapes (B), deterministic
  * mode (D), bitwise scalar family (H), and the user-extension
  * surface (K): a typed Aggregator UDAF and a Scala closure UDF.
  * The UDF/UDAF queries exist to cover the extension surface — the
  * scaladoc notes why built-ins beat them on hot paths (no codegen,
  * no pushdown through UDFs).
  */
object ExtraQueries extends QueryModule {

  /** Typed custom aggregate (SURVEY §2.2 K): geometric mean via
    * log-sum — the Aggregator[IN, BUF, OUT] shape used for any
    * custom sketch/statistic Spark lacks.
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: org.apache.spark.sql.Encoder[(Double, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  override val queries: Seq[Q] = Seq(
    Q("b_subquery_scalar",
      "Uncorrelated scalar subquery in a predicate (Catalyst plans one reusable subquery result).",
      (s, dir) => {
        T.views(s, dir, "customer")
        s.sql("""SELECT c_custkey, c_acctbal FROM customer
          WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
          ORDER BY c_custkey ASC NULLS LAST""")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
        ORDER BY c_custkey ASC NULLS LAST""")),

    Q("b_subquery_in",
      "IN (subquery) predicate → planned as a semi-join, not a per-row probe.",
      (s, dir) => {
        T.views(s, dir, "orders", "customer")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
            AND o_totalprice > 400000.0
          ORDER BY o_orderkey ASC NULLS LAST""")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
          AND o_totalprice > 400000.0
        ORDER BY o_orderkey ASC NULLS LAST""")),

    Q("b_subquery_correlated",
      "Correlated scalar subquery — Catalyst decorrelates to an aggregate + join (RewriteCorrelatedScalarSubquery, SURVEY §4).",
      (s, dir) => {
        T.views(s, dir, "orders")
        s.sql("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
          WHERE o.o_totalprice > 1.9 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                        WHERE o2.o_custkey = o.o_custkey)
          ORDER BY o.o_orderkey ASC NULLS LAST""")
      },
      Some("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
        WHERE o.o_totalprice > 1.9 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                      WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o.o_orderkey ASC NULLS LAST""")),

    Q("b_subquery_quantified",
      "Quantified subquery comparisons (> ALL in WHERE, = ANY projected) — Spark has no quantified comparison at all, so the dialect's three-valued aggregate-shell rewrite (round-13 fuzz v4) carries both; DuckDB runs the native syntax.",
      (s, dir) => {
        T.views(s, dir, "supplier", "nation")
        s.sql(graft.server.Dialect.rewrite(s,
          """SELECT s_suppkey, s_acctbal,
               s_nationkey = ANY (SELECT n_nationkey FROM nation WHERE n_regionkey = 1) AS in_region1
             FROM supplier
             WHERE s_acctbal > ALL (SELECT avg(s_acctbal) FROM supplier GROUP BY s_nationkey)
             ORDER BY s_suppkey ASC NULLS LAST"""))
      },
      Some("""SELECT s_suppkey, s_acctbal,
          s_nationkey = ANY (SELECT n_nationkey FROM nation WHERE n_regionkey = 1) AS in_region1
        FROM supplier
        WHERE s_acctbal > ALL (SELECT avg(s_acctbal) FROM supplier GROUP BY s_nationkey)
        ORDER BY s_suppkey ASC NULLS LAST""")),

    Q("d_mode",
      "mode(): deterministic modal value (smallest value among the most frequent — ties resolved identically on both engines).",
      (s, dir) => {
        val counts = T(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("n").desc_nulls_last, col("l_quantity").asc_nulls_last)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("modal_qty"), col("n"))
          .orderBy(col("l_returnflag").asc_nulls_last)
      },
      Some("""SELECT l_returnflag, l_quantity AS modal_qty, n FROM (
          SELECT l_returnflag, l_quantity, count(*) AS n,
            row_number() OVER (PARTITION BY l_returnflag
              ORDER BY count(*) DESC NULLS LAST, l_quantity ASC NULLS LAST) AS rn
          FROM lineitem GROUP BY l_returnflag, l_quantity) t
        WHERE rn = 1 ORDER BY l_returnflag ASC NULLS LAST""")),

    Q("d_moments",
      "Population skewness/kurtosis from explicit central-moment formulas — Spark's skewness/kurtosis are population estimators, DuckDB's are sample-corrected, so the portable realization computes the moments directly on both sides.",
      (s, dir) => {
        T.views(s, dir, "lineitem")
        s.sql("""WITH m AS (
            SELECT l_returnflag, avg(l_quantity) AS mu FROM lineitem GROUP BY l_returnflag)
          SELECT t.l_returnflag,
            round(avg(pow(l_quantity - mu, 3)) / pow(avg(pow(l_quantity - mu, 2)), 1.5), 4) + 0.0 AS skew_pop,
            round(avg(pow(l_quantity - mu, 4)) / pow(avg(pow(l_quantity - mu, 2)), 2) - 3, 4) + 0.0 AS kurt_excess_pop
          FROM lineitem t JOIN m ON t.l_returnflag = m.l_returnflag
          GROUP BY t.l_returnflag
          ORDER BY t.l_returnflag ASC NULLS LAST""")
      },
      Some("""WITH m AS (
          SELECT l_returnflag, avg(l_quantity) AS mu FROM lineitem GROUP BY l_returnflag)
        SELECT t.l_returnflag,
          round(avg(pow(l_quantity - mu, 3)) / pow(avg(pow(l_quantity - mu, 2)), 1.5), 4) + 0.0 AS skew_pop,
          round(avg(pow(l_quantity - mu, 4)) / pow(avg(pow(l_quantity - mu, 2)), 2) - 3, 4) + 0.0 AS kurt_excess_pop
        FROM lineitem t JOIN m ON t.l_returnflag = m.l_returnflag
        GROUP BY t.l_returnflag
        ORDER BY t.l_returnflag ASC NULLS LAST""")),

    Q("h_bitwise_fns",
      "Bitwise scalar family: and/or/xor/shifts/not, bit_count.",
      (s, dir) =>
        T(s, dir, "nation")
          .select(
            col("n_nationkey"),
            expr("n_nationkey & 12").as("band"),
            expr("n_nationkey | 3").as("bor"),
            expr("n_nationkey ^ 21").as("bxor"),
            expr("shiftleft(n_nationkey, 2)").as("shl"),
            expr("shiftright(n_nationkey, 1)").as("shr"),
            expr("~n_nationkey").as("bnot"),
            expr("bit_count(n_nationkey)").as("popcnt"))
          .orderBy(col("n_nationkey").asc_nulls_last),
      Some("""SELECT n_nationkey,
        n_nationkey & 12 AS band,
        n_nationkey | 3 AS bor,
        xor(n_nationkey, 21) AS bxor,
        n_nationkey << 2 AS shl,
        n_nationkey >> 1 AS shr,
        ~n_nationkey AS bnot,
        CAST(bit_count(n_nationkey) AS INT) AS popcnt
        FROM nation ORDER BY n_nationkey ASC NULLS LAST""")),

    Q("k_typed_aggregator",
      "Custom typed Aggregator UDAF (geometric mean); oracle is the closed form exp(avg(ln x)).",
      (s, dir) => {
        // register once per session — a repeat registration on a bench
        // re-run logs a `replaced a previously registered function`
        // WARN, and the warn-free-tail invariant treats any warn as
        // signal (WarnAuditSpec)
        if (s.sessionState.functionRegistry
            .lookupFunctionBuilder(
              org.apache.spark.sql.catalyst.FunctionIdentifier("geomean")).isEmpty)
          s.udf.register("geomean", udaf(GeoMean))
        T(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(round(expr("geomean(l_extendedprice)"), 2).as("geo_price"),
               count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_last)
      },
      Some("""SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 2) AS geo_price,
        count(*) AS n
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag ASC NULLS LAST""")),

    Q("k_scala_udf",
      "Scala closure UDF surface (SURVEY §2.2 K). Deliberately trivial: UDFs forfeit codegen and pushdown, so hot paths use built-ins/native expressions instead.",
      (s, dir) => {
        val normBrand = udf((b: String) => b.toLowerCase.replace("#", "-"))
        T(s, dir, "part")
          .filter(col("p_partkey") < 200)
          .select(col("p_partkey"), normBrand(col("p_brand")).as("brand_norm"))
          .orderBy(col("p_partkey").asc_nulls_last)
      },
      Some("""SELECT p_partkey, replace(lower(p_brand), '#', '-') AS brand_norm
        FROM part WHERE p_partkey < 200
        ORDER BY p_partkey ASC NULLS LAST""")))
}
