package graft.queries

import graft.{Q, QueryModule, T}

/** Round-15 batch — serving-plane surface opened this round
  * (reference scope: fb64/uquery-rs serves arbitrary DuckDB SQL over
  * one endpoint, src/core/duckdb.rs:87; these rows send the DuckDB
  * spelling through the FULL serving pipeline — Dialect.rewrite +
  * Dialect.sqlServed, exactly as QueryServer.scala:380 — while the
  * oracle runs the same text natively):
  *
  *   - e_frame_exclude_minmax_served — window-frame EXCLUDE for the
  *     NON-decomposable aggregates (min/max), the round-14 residue
  *     row: rewriteFrameExclude materializes the frame as a sorted
  *     collect_list (CURRENT ROW removes exactly one instance via the
  *     sorted head/second element; GROUP/TIES filter peers by a
  *     null-safe key test over collected (key, value) pairs).
  *     min/max carry no accumulation arithmetic, so DOUBLE operands
  *     hash-compare exactly.
  *
  * Scale note: the min/max EXCLUDE decomposition collects O(frame)
  * state per row — the price of an exact non-decomposable EXCLUDE —
  * but every window here is PARTITIONED (the zero-single-task-window
  * contract) and the collected frames share one WindowExec sort.
  */
object Round15Queries extends QueryModule {

  private def served(s: org.apache.spark.sql.SparkSession, sql: String) =
    graft.server.Dialect.sqlServed(s, graft.server.Dialect.rewrite(s, sql))

  private val minMaxExcludeSql =
    """SELECT o_orderkey AS k,
         min(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW) AS mn_cur,
         max(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS mx_grp,
         min(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS mn_ties
       FROM orders WHERE o_orderkey % 37 = 0
       ORDER BY k ASC NULLS LAST"""

  override val queries: Seq[Q] = Seq(
    Q("e_frame_exclude_minmax_served",
      "Window-frame EXCLUDE for min/max served through the dialect (round-15, verdict r14 ask #7): Spark has no EXCLUDE syntax and min/max are not subtraction-decomposable, so rewriteFrameExclude materializes the frame via sorted collect_list (one-instance removal for CURRENT ROW; null-safe peer-key filtering for GROUP/TIES); DuckDB runs the native clauses. No accumulation arithmetic, so DOUBLE compares exactly.",
      (s, dir) => { T.views(s, dir, "orders"); served(s, minMaxExcludeSql) },
      Some(minMaxExcludeSql)))
}
