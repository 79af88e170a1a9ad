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
        ORDER BY cohort_week ASC NULLS LAST, wk ASC NULLS LAST""")),

    Q("j_user_path",
      "Event-type transition matrix: per-user lag over (ts, event_id) — a deterministic total order even under equal timestamps — then Markov transition counts and per-source probabilities.",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val pw = org.apache.spark.sql.expressions.Window
          .partitionBy(col("prev_type"))
        T(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p_next",
            round(col("n").cast("double") / sum(col("n")).over(pw), 6))
          .orderBy(col("prev_type").asc_nulls_last, col("next_type").asc_nulls_last)
      },
      Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        t AS (SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
              FROM e)
        SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n,
          round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY prev_type), 6) AS p_next
        FROM t WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
        ORDER BY prev_type ASC NULLS LAST, next_type ASC NULLS LAST""")),

    Q("h_url_fns",
      "URL parsing family: host / path / query-param extraction (Spark parse_url — codegen'd builtin — against a pure-regex oracle) plus path depth.",
      (s, dir) => {
        val url = concat(
          lit("https://data-"), (col("doc_id") % 4).cast("string"),
          lit(".example.org/v"), (col("doc_id") % 3).cast("string"),
          lit("/items/"), col("doc_id").cast("string"),
          lit("?fmt=json&page="), (col("doc_id") % 9).cast("string"))
        T(s, dir, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("page")).as("page_param"),
            (size(split(parse_url(col("url"), lit("PATH")), "/")) - 1)
              .as("path_depth"))
          .orderBy(col("doc_id").asc_nulls_last)
      },
      Some("""WITH u AS (SELECT doc_id,
          'https://data-' || CAST(doc_id % 4 AS VARCHAR) || '.example.org/v' || CAST(doc_id % 3 AS VARCHAR) ||
          '/items/' || CAST(doc_id AS VARCHAR) || '?fmt=json&page=' || CAST(doc_id % 9 AS VARCHAR) AS url
          FROM documents WHERE doc_id < 100)
        SELECT doc_id,
          regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
          regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1) AS path,
          regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page_param,
          CAST(len(string_split(regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1), '/')) - 1 AS INTEGER) AS path_depth
        FROM u ORDER BY doc_id ASC NULLS LAST""")),

    Q("j_concurrency_sweep",
      "Max concurrent sessions per day via the interval sweep: each view opens a 30-min session, start/end become +1/−1 deltas, a per-day ordered cumsum tracks the live count — ends sort before coincident starts (delta ASC) so back-to-back sessions never double-count. O(n log n) per day partition, no interval self-join.",
      (s, dir) => {
        val e = T(s, dir, "events")
          .filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"))
        val pts = e.select(date_trunc("day", col("ts")).cast("date").as("d"),
            col("ts").as("t"), lit(1).as("delta"), col("event_id"))
          .unionAll(e.select(date_trunc("day", col("ts")).cast("date").as("d"),
            (col("ts") + expr("INTERVAL 30 MINUTE")).as("t"),
            lit(-1).as("delta"), col("event_id")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("d"))
          .orderBy(col("t").asc, col("delta").asc, col("event_id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        pts.withColumn("live", sum(col("delta")).over(w))
          .groupBy(col("d"))
          .agg(max(col("live")).cast("long").as("max_concurrent"),
            expr("count(1) div 2").as("n_sessions"))
          .orderBy(col("d").asc_nulls_last)
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events WHERE event_type = 'view'),
        pts AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS d, ts AS t, 1 AS delta, event_id FROM e
          UNION ALL
          SELECT CAST(date_trunc('day', ts) AS DATE) AS d, ts + INTERVAL 30 MINUTE AS t, -1 AS delta, event_id FROM e),
        c AS (SELECT d, t, delta,
                sum(delta) OVER (PARTITION BY d ORDER BY t ASC, delta ASC, event_id ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
              FROM pts)
        SELECT d, CAST(max(live) AS BIGINT) AS max_concurrent,
          CAST(count(*) // 2 AS BIGINT) AS n_sessions
        FROM c GROUP BY d ORDER BY d ASC NULLS LAST""")),

    Q("j_attribution",
      "Last-touch revenue attribution: each purchase credits the user's most recent click's channel (JSON props → channel id), carried forward by last_value IGNORE NULLS over a deterministic (ts, event_id) order — purchases before any click fall to 'organic'. Exact-decimal revenue totals.",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        T(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("value"),
            col("ts"), col("event_id"),
            concat(lit("ch"),
              (get_json_object(col("props"), "$.k").cast("int") % 3).cast("string"))
              .as("channel"))
          .withColumn("attr_channel",
            last(when(col("event_type") === "click", col("channel")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("attr_channel"), lit("organic")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            graft.Exact.sumExact(col("value")).as("revenue"))
          .orderBy(col("channel").asc_nulls_last)
      },
      Some("""WITH e AS (SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts, event_id,
            'ch' || CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 3 AS VARCHAR) AS channel
          FROM events),
        m AS (SELECT user_id, event_type, value, ts, event_id,
                last_value(CASE WHEN event_type = 'click' THEN channel END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_channel
              FROM e)
        SELECT COALESCE(attr_channel, 'organic') AS channel,
          CAST(count(*) AS BIGINT) AS n_purchases,
          round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
        FROM m WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY channel ASC NULLS LAST""")),

    Q("j_anomaly_zscore",
      "Time-series anomaly scoring: per-type daily counts z-scored against the trailing 7-day window — mean/variance from EXACT integer window sums (Σn, Σn², k), so both engines divide identical operands and the rounded z cannot drift.",
      (s, dir) => {
        val tw = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("d"))
          .rowsBetween(-7, -1)
        val daily = T(s, dir, "events")
          .select(col("event_type"),
            date_trunc("day", col("ts")).cast("date").as("d"))
          .groupBy(col("event_type"), col("d"))
          .agg(count(lit(1)).as("n"))
        val mean = col("s").cast("double") / col("k")
        val variance = col("ss").cast("double") / col("k") - mean * mean
        daily
          .withColumn("s", sum(col("n")).over(tw))
          .withColumn("ss", sum(col("n") * col("n")).over(tw))
          .withColumn("k", count(lit(1)).over(tw))
          .filter(col("k") >= 7 && variance > 0)
          .select(col("event_type"), col("d"), col("n"),
            round((col("n") - mean) / sqrt(variance), 4).as("z"))
          .orderBy(col("event_type").asc_nulls_last, col("d").asc_nulls_last)
      },
      Some("""WITH e AS (SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d FROM events),
        daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
        w AS (SELECT event_type, d, n,
                CAST(sum(n) OVER tw AS BIGINT) AS s,
                CAST(sum(n * n) OVER tw AS BIGINT) AS ss,
                CAST(count(*) OVER tw AS BIGINT) AS k
              FROM daily
              WINDOW tw AS (PARTITION BY event_type ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        SELECT event_type, d, n,
          round((n - CAST(s AS DOUBLE) / k) / sqrt(CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k)), 4) AS z
        FROM w WHERE k >= 7
          AND CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k) > 0
        ORDER BY event_type ASC NULLS LAST, d ASC NULLS LAST""")),

    Q("n_heavy_hitters",
      "Heavy hitters via a mergeable Misra-Gries summary (typed Aggregator, k=64): per-partition bounded sketches, only summaries shuffle. k exceeds the fixture vocabulary so counts are exact — oracle is the plain GROUP BY top-10 (approximation regime spec'd at small k with MG bound assertions).",
      (s, dir) => {
        import s.implicits._
        val hh = new graft.operators.HeavyHitters(64, 10)
        T(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("w")).as[String]
          .select(hh.toColumn.name("top"))
          .select(explode(col("top")).as("e"))
          .select(col("e._1").as("w"), col("e._2").as("est"))
          .orderBy(col("est").desc, col("w").asc_nulls_last)
      },
      Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        c AS (SELECT w, CAST(count(*) AS BIGINT) AS est FROM w GROUP BY w)
        SELECT w, est FROM c ORDER BY est DESC, w ASC NULLS LAST LIMIT 10""")))
}
