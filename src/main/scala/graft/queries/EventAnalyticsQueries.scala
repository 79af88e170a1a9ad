package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream: funnel
  * conversion and cohort retention — the query shapes the reference's
  * SQL-speaking users run daily against event tables
  * (uquery-rs docs/docs/intro.md positions the server over exactly
  * this kind of analytical SQL).
  *
  * Scale notes: both are user-keyed aggregations — every join is an
  * equi-join on user_id (hash-partitionable, AQE-skew-splittable), the
  * step sequences are min-timestamp aggregates rather than sort-based
  * sessionization, and nothing widens beyond (users × steps) rows.
  *
  * Timestamp discipline: events.ts is parquet NANOS; Spark floors to µs
  * (Q.scala loader), so oracles compare through CAST(ts AS TIMESTAMP)
  * which applies the same truncation in DuckDB.
  */
object EventAnalyticsQueries extends QueryModule {

  override val queries: Seq[Q] = Seq(

    Q("j_funnel",
      "Funnel conversion per user segment: first view → first click within 2h → first purchase within 24h (strictly ordered steps via min-timestamp aggregates + time-bounded equi-joins, no sessionization sort).",
      (s, dir) => {
        val e = T(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("ts") > col("t_view") &&
            col("ts") <= col("t_view") + expr("INTERVAL 2 HOUR"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("ts") > col("t_click") &&
            col("ts") <= col("t_click") + expr("INTERVAL 24 HOUR"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        v.join(c.select(col("user_id"), lit(1).as("clicked")), Seq("user_id"), "left")
          .join(p.select(col("user_id"), lit(1).as("purchased")), Seq("user_id"), "left")
          .groupBy((col("user_id") % 5).as("segment"))
          .agg(
            count(lit(1)).as("n_view"),
            count(col("clicked")).as("n_click"),
            count(col("purchased")).as("n_purchase"),
            round(count(col("clicked")).cast("double") / count(lit(1)), 6).as("view_to_click"),
            round(count(col("purchased")).cast("double") /
              when(count(col("clicked")) === 0, lit(null)).otherwise(count(col("clicked"))),
              6).as("click_to_purchase"))
          .orderBy(col("segment").asc_nulls_last)
      },
      Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        v AS (SELECT user_id, min(ts) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS t_click
              FROM e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.t_view
                AND e.ts <= v.t_view + INTERVAL 2 HOUR GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS t_purchase
              FROM e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                AND e.ts <= c.t_click + INTERVAL 24 HOUR GROUP BY e.user_id)
        SELECT CAST(v.user_id % 5 AS BIGINT) AS segment,
          CAST(count(*) AS BIGINT) AS n_view,
          CAST(count(c.user_id) AS BIGINT) AS n_click,
          CAST(count(p.user_id) AS BIGINT) AS n_purchase,
          round(CAST(count(c.user_id) AS DOUBLE) / count(*), 6) AS view_to_click,
          round(CAST(count(p.user_id) AS DOUBLE) / NULLIF(count(c.user_id), 0), 6) AS click_to_purchase
        FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON c.user_id = p.user_id
        GROUP BY v.user_id % 5 ORDER BY segment ASC NULLS LAST""")),

    Q("j_retention",
      "Cohort retention: users grouped by first-seen ISO week, counted active in week k when they made a purchase over 150 — distinct-user week matrix plus retention rate vs cohort size.",
      (s, dir) => {
        val e = T(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("value"), col("ts"))
        val f = e.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
        val cohortSize = f.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
        val active = e.filter(col("event_type") === "purchase" && col("value") > 150)
          .join(f, "user_id")
          .select(col("user_id"), col("cohort"),
            (datediff(date_trunc("week", col("ts")).cast("date"), col("cohort")) / 7)
              .cast("int").as("wk"))
          .distinct()
        active.groupBy(col("cohort"), col("wk"))
          .agg(count(lit(1)).as("n_active"))
          .join(cohortSize, "cohort")
          .select(col("cohort").as("cohort_week"), col("wk"), col("n_active"),
            round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
          .orderBy(col("cohort_week").asc_nulls_last, col("wk").asc_nulls_last)
      },
      Some("""WITH e AS (SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
        f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort FROM e GROUP BY user_id),
        cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort FROM f GROUP BY cohort),
        a AS (SELECT DISTINCT e.user_id, f.cohort,
                CAST(datediff('day', f.cohort, CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INTEGER) AS wk
              FROM e JOIN f ON e.user_id = f.user_id
              WHERE e.event_type = 'purchase' AND e.value > 150)
        SELECT a.cohort AS cohort_week, wk, CAST(count(*) AS BIGINT) AS n_active,
          round(CAST(count(*) AS DOUBLE) / max(cs.n_cohort), 6) AS retention
        FROM a JOIN cs ON a.cohort = cs.cohort
        GROUP BY a.cohort, wk
        ORDER BY cohort_week ASC NULLS LAST, wk ASC NULLS LAST""")))
}
