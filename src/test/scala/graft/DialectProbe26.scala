package graft

import graft.server.Dialect

/** Round-12 probe tier 26: float-edge semantics — NaN/±0.0/±inf in
  * comparisons, grouping, ordering, min/max/greatest, arithmetic,
  * classification functions, and string casts. DuckDB ground truth
  * run 2026-08-15 (values in comments).
  *
  * The sweep's findings (all closed + pinned in DialectSpec probe-26):
  *   1. THE catch of the round: DuckDB's default NULL order is NULLS
  *      LAST in both directions; Spark's ASC default is NULLS FIRST —
  *      every plain `ORDER BY x` on the serving plane silently
  *      reordered NULL rows (only COLUMNS-expanded keys and
  *      in-aggregate ORDER BYs spelled it out). rewriteOrderNulls now
  *      appends NULLS LAST to every unspelled key — outer queries,
  *      subqueries, windows (frames survive), positional/CASE/ALL
  *      keys — and explicit spellings pass through.
  *   2. signbit(-0.0) IS true in DuckDB 1.5.2 (the old x<0 form — and
  *      its own doc comment — said false).
  *   3. Matching already, now pinned: NaN = NaN true / NaN greatest /
  *      NaN groups / -0.0 = 0.0 and groups with it / NaN before NULL
  *      in ASC order / double division by zero NULL / isnan/isinf/
  *      isfinite / inf-inf = NaN / sqrt(-1), ln(0) loud domain errors
  *      (the earlier-round registrations — Java alone returns NaN).
  *   4. CAST(floating AS VARCHAR) carried Java's rendering ('1.0E8',
  *      'NaN') — now rewriteVarcharCasts + VarcharCastDispatch send
  *      DOUBLE/FLOAT sources through the DuckDB text renderer
  *      (DuckFloatText, the expression face of the probe-12 encoder
  *      rules); every other source keeps Spark's cast.
  *   5. Documented residue (COVERAGE omissions): floor/ceil of
  *      non-finite doubles (BIGINT typing makes floor(nan) = 0 here
  *      vs nan there).
  */
object DialectProbe26 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    GraftExtensions.injectInto(spark)
    val cases = Seq(
      // duck: true, true, false (NaN = NaN; NaN greatest)
      "SELECT CAST('nan' AS DOUBLE) = CAST('nan' AS DOUBLE) AS a, CAST('nan' AS DOUBLE) > 1e308 AS b, CAST('nan' AS DOUBLE) < CAST('inf' AS DOUBLE) AS c",
      // duck: inf, -inf, nan
      "SELECT CAST('inf' AS DOUBLE) AS a, CAST('-Infinity' AS DOUBLE) AS b, CAST('NaN' AS DOUBLE) AS c",
      // duck: true, NULL (division by zero is NULL even on doubles)
      "SELECT CAST(-0.0 AS DOUBLE) = CAST(0.0 AS DOUBLE) AS a, 1.0/0.0 AS b",
      // duck: (0.0, 2), (nan, 2) — -0.0 groups with 0.0, NaNs group
      "SELECT x, count(*) AS c FROM (VALUES (CAST('nan' AS DOUBLE)),(CAST('nan' AS DOUBLE)),(CAST(0.0 AS DOUBLE)),(CAST(-0.0 AS DOUBLE))) t(x) GROUP BY x ORDER BY x",
      // duck ASC: -inf, 1.0, inf, nan, NULL
      "SELECT x FROM (VALUES (CAST(1.0 AS DOUBLE)),(CAST('nan' AS DOUBLE)),(CAST('inf' AS DOUBLE)),(CAST('-inf' AS DOUBLE)),(CAST(NULL AS DOUBLE))) t(x) ORDER BY x",
      // duck: nan, 1.0 (NaN is the max)
      "SELECT max(x) AS mx, min(x) AS mn FROM (VALUES (CAST(1.0 AS DOUBLE)),(CAST('nan' AS DOUBLE)),(CAST('inf' AS DOUBLE))) t(x)",
      // duck: true, true, true, true
      "SELECT isnan(CAST('nan' AS DOUBLE)) AS a, isinf(CAST('inf' AS DOUBLE)) AS b, isfinite(1.0) AS c, signbit(CAST(-0.0 AS DOUBLE)) AS d",
      // duck: nan, nan (IEEE)
      "SELECT CAST('inf' AS DOUBLE) - CAST('inf' AS DOUBLE) AS a, 0.0 * CAST('inf' AS DOUBLE) AS b",
      // duck: nan, 1.0
      "SELECT greatest(1.0, CAST('nan' AS DOUBLE)) AS a, least(1.0, CAST('nan' AS DOUBLE)) AS b",
      // duck: ERROR (Out of Range) — Java returns NaN
      "SELECT sqrt(-1.0) AS a",
      "SELECT ln(0.0) AS b",
      // duck: 'nan', 'inf', '-0.0' — Java renders NaN / Infinity
      "SELECT CAST(CAST('nan' AS DOUBLE) AS VARCHAR) AS a, CAST(CAST('inf' AS DOUBLE) AS VARCHAR) AS b, CAST(CAST(-0.0 AS DOUBLE) AS VARCHAR) AS c",
      // duck: nan, inf
      "SELECT floor(CAST('nan' AS DOUBLE)) AS a, round(CAST('inf' AS DOUBLE), 2) AS b")
    cases.foreach { sql =>
      try {
        val rows = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql)).collect()
        println(s"OK  : ${sql.take(130)}\n  -> ${rows.mkString("; ").take(200)}")
      } catch {
        case e: Throwable =>
          println(s"ERR : ${sql.take(130)}\n  -> ${e.getMessage.takeWhile(_ != '\n').take(160)}")
      }
    }
  }
}
