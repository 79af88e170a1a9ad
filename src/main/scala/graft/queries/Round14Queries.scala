package graft.queries

import graft.{Q, QueryModule, T}

/** Round-14 batch — the serving-plane surface grammar v8 opened,
  * promoted to oracle-checked rows (reference scope: fb64/uquery-rs
  * serves arbitrary DuckDB SQL over one endpoint, src/core/duckdb.rs:87
  * — these rows send the DuckDB spelling through `Dialect.rewrite`
  * exactly as the HTTP path does, while the oracle runs the SAME text
  * natively in DuckDB):
  *
  *   - e_frame_exclude_served — window-frame EXCLUDE CURRENT ROW /
  *     GROUP / TIES through rewriteFrameExclude (sum/count decompose
  *     into shared-spec window aggregates plus the peer frame). The
  *     summed operand is DECIMAL so the decomposition (total − peer)
  *     is EXACT on both engines — no accumulation-order residue for
  *     the hash compare. avg's double path is covered by the fuzz
  *     sweeps (1e-9 tolerance) and the DialectSpec pins.
  *   - g_union_by_name_nested — UNION ALL BY NAME inside a derived
  *     table (the recursive span rewrite).
  *   - i_pivot_tail_served — the simplified PIVOT statement with
  *     DuckDB's ORDER BY … LIMIT tail carried onto Spark's PIVOT.
  *
  * Scale note: all three are rewrite-plane rows — the EXCLUDE
  * decomposition adds one peer-frame pass over the SAME sort order
  * (no extra shuffle; WindowExec shares the spec), BY NAME is two
  * projections, PIVOT is the documented two-pass dynamic-pivot shape.
  */
object Round14Queries extends QueryModule {

  // the FULL serving pipeline, as QueryServer.scala:380 runs it: text
  // rewrite + the parse-level plane (DuckDB division semantics,
  // null-poison folds, DISTINCT-over folds). Routing through
  // Dialect.rewrite alone would skip the parse plane and silently
  // diverge for future rows copied from this module (round-14 advice).
  private def served(s: org.apache.spark.sql.SparkSession, sql: String) =
    graft.server.Dialect.sqlServed(s, graft.server.Dialect.rewrite(s, sql))

  // every window is PARTITIONED (the project's zero-single-task-window
  // contract, WarnAuditSpec); the global-ORDER EXCLUDE shapes are
  // covered by the fuzz families and DialectSpec pins
  private val excludeSql =
    """SELECT o_orderkey AS k,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) OVER (PARTITION BY o_orderstatus
             ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS DOUBLE), 4) AS s_cur,
         count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS c_grp,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) OVER (PARTITION BY o_orderstatus
             ORDER BY o_orderdate
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS DOUBLE), 4) AS s_ties
       FROM orders WHERE o_orderkey % 37 = 0
       ORDER BY k ASC NULLS LAST"""

  private val byNameSql =
    """SELECT a, b FROM (
         SELECT o_orderstatus AS a, count(*) AS b FROM orders GROUP BY a
         UNION ALL BY NAME
         SELECT count(*) AS b, l_returnflag AS a FROM lineitem GROUP BY a) z
       ORDER BY a ASC NULLS LAST, b ASC NULLS LAST"""

  private val pivotSql =
    "PIVOT orders ON o_orderstatus USING count(o_orderkey) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT 3"

  override val queries: Seq[Q] = Seq(
    Q("e_frame_exclude_served",
      "Window-frame EXCLUDE CURRENT ROW / GROUP / TIES served through the dialect (round-14 fuzz v8): Spark has no EXCLUDE syntax, so rewriteFrameExclude decomposes sum/count into window aggregates over the same spec plus the peer frame; DuckDB runs the native clauses. DECIMAL operand keeps the total-minus-peer subtraction exact.",
      (s, dir) => { T.views(s, dir, "orders"); served(s, excludeSql) },
      Some(excludeSql)),

    Q("g_union_by_name_nested",
      "UNION ALL BY NAME nested inside a derived table (round-14 fuzz v8): the rewrite recurses into the innermost paren span where the union is top-level; DuckDB parses the spelling natively.",
      (s, dir) => { T.views(s, dir, "orders", "lineitem"); served(s, byNameSql) },
      Some(byNameSql)),

    Q("i_pivot_tail_served",
      "Simplified PIVOT statement with DuckDB's ORDER BY … LIMIT tail (round-14): the rewrite enumerates spreading values (sorted, like DuckDB) and carries the tail onto Spark's PIVOT clause.",
      (s, dir) => { T.views(s, dir, "orders"); served(s, pivotSql) },
      Some(pivotSql)))
}
