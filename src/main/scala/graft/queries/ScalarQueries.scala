package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 H — scalar function families. Everything here is
  * `org.apache.spark.sql.functions._` / built-in SQL functions, i.e.
  * whole-stage-codegen'd expressions: no UDFs anywhere on these paths,
  * so the per-row cost is compiled loop bodies, not lambda dispatch.
  * Libm-backed functions (exp/ln/trig) are rounded before compare —
  * JVM vs C++ libm may differ in the last ulp.
  */
object ScalarQueries extends QueryModule {

  override val queries: Seq[Q] = Seq(
    Q("h_string_fns",
      "String family: concat/length/upper/lower/trim/substring/replace/split_part/lpad/repeat/reverse/instr/levenshtein/format (SURVEY §2.2 H).",
      (s, dir) =>
        T(s, dir, "part")
          .filter(col("p_partkey") < 500)
          .select(
            col("p_partkey"),
            concat(col("p_brand"), lit(":"), col("p_name")).as("tagged"),
            length(col("p_name")).as("name_len"),
            upper(col("p_type")).as("type_uc"),
            lower(col("p_brand")).as("brand_lc"),
            trim(lit("  padded  ")).as("trimmed"),
            substring(col("p_name"), 1, 4).as("name4"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
            split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
            lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
            repeat(lit("ab"), 3).as("abab"),
            reverse(col("p_brand")).as("brand_rev"),
            instr(col("p_name"), " ").as("space_at"),
            levenshtein(col("p_brand"), lit("Brand#1")).as("lev"),
            format_string("%s/%d", col("p_brand"), col("p_size")).as("fmt"),
            col("p_name").startsWith("red").as("is_red"),
            col("p_name").contains("widget").as("has_widget"))
          .orderBy(col("p_partkey").asc_nulls_last),
      Some("""SELECT p_partkey,
        concat(p_brand, ':', p_name) AS tagged,
        CAST(length(p_name) AS INT) AS name_len,
        upper(p_type) AS type_uc, lower(p_brand) AS brand_lc,
        trim('  padded  ') AS trimmed,
        substring(p_name, 1, 4) AS name4,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        split_part(p_name, ' ', 1) AS first_word,
        lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        repeat('ab', 3) AS abab,
        reverse(p_brand) AS brand_rev,
        CAST(instr(p_name, ' ') AS INT) AS space_at,
        CAST(levenshtein(p_brand, 'Brand#1') AS INT) AS lev,
        printf('%s/%d', p_brand, p_size) AS fmt,
        starts_with(p_name, 'red') AS is_red,
        contains(p_name, 'widget') AS has_widget
        FROM part WHERE p_partkey < 500
        ORDER BY p_partkey ASC NULLS LAST""")),

    Q("h_string_similarity",
      "String similarity family: levenshtein + character-set jaccard (composed from array built-ins; oracle uses DuckDB's NATIVE jaccard()).",
      (s, dir) => {
        def charset(c: org.apache.spark.sql.Column) =
          array_distinct(split(c, ""))
        T(s, dir, "part")
          .filter(col("p_partkey") < 300)
          .select(
            col("p_partkey"),
            levenshtein(col("p_name"), lit("red widget")).as("lev_dist"),
            round(
              size(array_intersect(charset(col("p_name")), charset(lit("red widget"))))
                .cast("double") /
              size(array_union(charset(col("p_name")), charset(lit("red widget")))), 6)
              .as("char_jaccard"))
          .orderBy(col("p_partkey").asc_nulls_last)
      },
      Some("""SELECT p_partkey,
        CAST(levenshtein(p_name, 'red widget') AS INT) AS lev_dist,
        round(jaccard(p_name, 'red widget'), 6) AS char_jaccard
        FROM part WHERE p_partkey < 300
        ORDER BY p_partkey ASC NULLS LAST""")),

    Q("h_regex_fns",
      "Regex family: extract with group, full-match (rlike anchored ↔ regexp_full_match), ilike.",
      (s, dir) =>
        T(s, dir, "part")
          .filter(col("p_partkey") < 500)
          .select(
            col("p_partkey"),
            regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
            col("p_name").rlike("^(red|blue) .*$").as("is_primary_color"),
            col("p_type").ilike("eco%").as("is_eco"))
          .orderBy(col("p_partkey").asc_nulls_last),
      Some("""SELECT p_partkey,
        regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        regexp_full_match(p_name, '(red|blue) .*') AS is_primary_color,
        p_type ILIKE 'eco%' AS is_eco
        FROM part WHERE p_partkey < 500
        ORDER BY p_partkey ASC NULLS LAST""")),

    Q("h_datetime_fns",
      "Date/time family: trunc/extract/diff/add/make_date/epoch/format/interval arithmetic (SURVEY §2.2 H; session TZ pinned UTC both engines).",
      (s, dir) =>
        T(s, dir, "orders")
          .filter(col("o_orderkey") < 2000)
          .select(
            col("o_orderkey"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            quarter(col("o_orderdate")).as("qtr"),
            // Monday=0 by day-count arithmetic from a Monday epoch
            // (1970-01-05) — NOT functions.weekday/dayofweek: those
            // resolve through the session registry (Column.fn) where
            // the dialect's DuckDB Sunday=0 overrides rightly win
            expr("((datediff(CAST(o_orderdate AS DATE), DATE'1970-01-05') % 7) + 7) % 7")
              .as("wd_mon0"),
            datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
            date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
            make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("month_date"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"),
            (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("plus3d"))
          .orderBy(col("o_orderkey").asc_nulls_last),
      Some("""SELECT o_orderkey,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        CAST(extract(year FROM o_orderdate) AS INT) AS yr,
        CAST(extract(month FROM o_orderdate) AS INT) AS mo,
        CAST(extract(day FROM o_orderdate) AS INT) AS dom,
        CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
        CAST(extract(isodow FROM o_orderdate) - 1 AS INT) AS wd_mon0,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        CAST(o_orderdate AS DATE) + 30 AS due_date,
        make_date(CAST(extract(year FROM o_orderdate) AS INT),
                  CAST(extract(month FROM o_orderdate) AS INT), 1) AS month_date,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        strftime(o_orderdate, '%Y-%m-%d') AS iso,
        o_orderdate + INTERVAL 3 DAY AS plus3d
        FROM orders WHERE o_orderkey < 2000
        ORDER BY o_orderkey ASC NULLS LAST""")),

    Q("h_math_fns",
      "Math family: abs/ceil/floor/round/pow/sqrt/ln/log10/exp/sign/mod/int-div, libm outputs rounded.",
      (s, dir) =>
        T(s, dir, "supplier")
          .select(
            col("s_suppkey"),
            abs(col("s_acctbal")).as("bal_abs"),
            ceil(col("s_acctbal")).cast("long").as("bal_ceil"),
            floor(col("s_acctbal")).cast("long").as("bal_floor"),
            round(col("s_acctbal"), 1).as("bal_r1"),
            round(pow(col("s_suppkey").cast("double"), 2.0), 6).as("key_sq"),
            round(sqrt(abs(col("s_acctbal"))), 6).as("bal_sqrt"),
            round(log(abs(col("s_acctbal")) + 1.0), 6).as("bal_ln"),
            round(log10(abs(col("s_acctbal")) + 1.0), 6).as("bal_log10"),
            round(exp(col("s_suppkey").cast("double") / 100.0), 6).as("key_exp"),
            signum(col("s_acctbal")).cast("int").as("bal_sign"),
            (col("s_suppkey") % 7).as("key_mod7"),
            floor(col("s_suppkey") / 7.0).cast("long").as("key_div7"),
            round(sin(col("s_suppkey").cast("double")), 6).as("key_sin"))
          .orderBy(col("s_suppkey").asc_nulls_last),
      Some("""SELECT s_suppkey,
        abs(s_acctbal) AS bal_abs,
        CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
        CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
        round(s_acctbal, 1) AS bal_r1,
        round(pow(CAST(s_suppkey AS DOUBLE), 2.0), 6) AS key_sq,
        round(sqrt(abs(s_acctbal)), 6) AS bal_sqrt,
        round(ln(abs(s_acctbal) + 1.0), 6) AS bal_ln,
        round(log10(abs(s_acctbal) + 1.0), 6) AS bal_log10,
        round(exp(CAST(s_suppkey AS DOUBLE) / 100.0), 6) AS key_exp,
        CAST(sign(s_acctbal) AS INT) AS bal_sign,
        s_suppkey % 7 AS key_mod7,
        CAST(floor(s_suppkey / 7.0) AS BIGINT) AS key_div7,
        round(sin(CAST(s_suppkey AS DOUBLE)), 6) AS key_sin
        FROM supplier ORDER BY s_suppkey ASC NULLS LAST""")),

    Q("h_array_fns",
      "List/array family: literal, size, contains, position, transform, filter, aggregate/reduce, sort, distinct, flatten, sequence, slice.",
      (s, dir) =>
        T(s, dir, "documents")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .select(
            col("doc_id"),
            size(col("words")).as("n_words"),
            array_contains(col("words"), "spark").as("has_spark"),
            array_position(col("words"), "data").as("data_pos"),
            // List-typed results are joined to strings at the boundary: the driver's
            // comparator sorts pandas frames and cannot hash ndarray cells. '|' keeps
            // empty tokens visible, unlike relying on element order alone.
            concat_ws("|", expr("transform(slice(words, 1, 5), w -> upper(w))")).as("first5_uc"),
            concat_ws("|", expr("filter(words, w -> length(w) > 4)")).as("long_words"),
            expr("aggregate(words, 0, (acc, w) -> acc + length(w))").as("total_chars"),
            concat_ws("|", array_sort(array_distinct(slice(col("words"), 1, 8)))).as("first8_sorted_uniq"),
            concat_ws("|", flatten(array(slice(col("words"), 1, 2), slice(col("words"), 3, 2)))).as("flat4"),
            concat_ws(",", expr("transform(sequence(1, 4), x -> cast(x as string))")).as("seq14"))
          .orderBy(col("doc_id").asc_nulls_last),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 100)
        SELECT doc_id,
          CAST(len(words) AS INT) AS n_words,
          list_contains(words, 'spark') AS has_spark,
          CAST(list_position(words, 'data') AS BIGINT) AS data_pos,
          array_to_string(list_transform(words[1:5], w -> upper(w)), '|') AS first5_uc,
          array_to_string(list_filter(words, w -> length(w) > 4), '|') AS long_words,
          CAST(list_sum(list_transform(words, w -> length(w))) AS INT) AS total_chars,
          array_to_string(list_sort(list_distinct(words[1:8])), '|') AS first8_sorted_uniq,
          array_to_string(flatten([words[1:2], words[3:4]]), '|') AS flat4,
          array_to_string(list_transform(generate_series(1, 4), x -> CAST(x AS VARCHAR)), ',') AS seq14
        FROM w ORDER BY doc_id ASC NULLS LAST""")),

    Q("h_struct_map_fns",
      "Struct/map family: struct_pack ↔ struct(), field access, map construction + element_at + sorted keys.",
      (s, dir) =>
        T(s, dir, "nation")
          .select(
            col("n_nationkey"),
            // Struct/map cells are serialized to JSON / joined strings at the boundary:
            // the driver's comparator cannot hash dict/ndarray cells.
            to_json(struct(col("n_name").as("name"), col("n_regionkey").as("region"))).as("info"),
            struct(col("n_name").as("name"), col("n_regionkey").as("region"))
              .getField("region").as("region_from_struct"),
            element_at(map(lit("rk"), col("n_regionkey"), lit("nk"), col("n_nationkey")), "rk")
              .as("rk_from_map"),
            concat_ws("|", array_sort(map_keys(
              map(lit("rk"), col("n_regionkey"), lit("nk"), col("n_nationkey")))))
              .as("mkeys"),
            size(map(lit("rk"), col("n_regionkey"), lit("nk"), col("n_nationkey")))
              .as("cardinality"))
          .orderBy(col("n_nationkey").asc_nulls_last),
      Some("""SELECT n_nationkey,
        CAST(to_json(struct_pack(name := n_name, region := n_regionkey)) AS VARCHAR) AS info,
        struct_pack(name := n_name, region := n_regionkey).region AS region_from_struct,
        map(['rk','nk'], [n_regionkey, n_nationkey])['rk'][1] AS rk_from_map,
        array_to_string(list_sort(map_keys(map(['rk','nk'], [n_regionkey, n_nationkey]))), '|') AS mkeys,
        CAST(cardinality(map(['rk','nk'], [n_regionkey, n_nationkey])) AS INT) AS cardinality
        FROM nation ORDER BY n_nationkey ASC NULLS LAST""")),

    Q("h_json_fns",
      "JSON family on events.props: path extraction, typed from_json, validity (SURVEY §2.2 H).",
      (s, dir) =>
        T(s, dir, "events")
          .filter(col("event_id") < 1000)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k_int"),
            get_json_object(col("props"), "$.k").as("k_str"),
            from_json(col("props"), lit("k INT")).getField("k").as("k_typed"),
            get_json_object(col("props"), "$.missing").as("missing_path"))
          .orderBy(col("event_id").asc_nulls_last),
      Some("""SELECT event_id,
        CAST(props->>'k' AS INT) AS k_int,
        props->>'k' AS k_str,
        CAST(props->>'k' AS INT) AS k_typed,
        props->>'missing' AS missing_path
        FROM events WHERE event_id < 1000
        ORDER BY event_id ASC NULLS LAST""")),

    Q("h_strftime_fns",
      "DuckDB C-style strftime/strptime (%-directives) against DuckDB's native implementations: the GraftExtensions registration translates the format literal to a JDK pattern at bind time and renders/parses through the codegen'd builtins.",
      (s, dir) => {
        // inject into an ISOLATED child session: Spark 4's functions
        // API resolves by NAME through the session registry, so
        // injecting into the shared library session would silently
        // flip the semantics of every later DataFrame query using an
        // overridden name (first-match regexp_replace, swapped-arg
        // trim, base-10 log, utf8proc upper/lower…) — an
        // iteration-order hazard the round-11e full-run Verify caught.
        // The serving plane (QueryServer) owns its session and injects
        // there by design; the library session stays builtin-pure.
        val s2 = s.newSession()
        graft.GraftExtensions.injectInto(s2)
        T.views(s2, dir, "orders")
        s2.sql("""SELECT o_orderkey,
            strftime(o_orderdate, '%Y-%m-%d') AS iso,
            strftime(o_orderdate, '%-d %B %Y') AS pretty,
            strftime(o_orderdate, '%a %j') AS dow_doy,
            strptime(strftime(o_orderdate, '%d/%m/%Y %H:%M:%S'), '%d/%m/%Y %H:%M:%S') AS round_trip
          FROM orders WHERE o_orderkey < 200
          ORDER BY o_orderkey ASC NULLS LAST""")
      },
      Some("""SELECT o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS iso,
          strftime(o_orderdate, '%-d %B %Y') AS pretty,
          strftime(o_orderdate, '%a %j') AS dow_doy,
          strptime(strftime(o_orderdate, '%d/%m/%Y %H:%M:%S'), '%d/%m/%Y %H:%M:%S') AS round_trip
        FROM orders WHERE o_orderkey < 200
        ORDER BY o_orderkey ASC NULLS LAST""")),

    Q("h_conditional_hash_fns",
      "Conditional + digest family: if/ifnull/nullif, md5, sha2-256 (cross-engine-stable digests; xxhash64/hash are engine-specific, used on non-oracle paths).",
      (s, dir) =>
        T(s, dir, "region")
          .select(
            col("r_regionkey"),
            expr("if(r_regionkey % 2 = 0, 'even', 'odd')").as("parity"),
            expr("ifnull(nullif(r_name, 'REGION_0'), 'zero')").as("name_or_zero"),
            md5(col("r_name")).as("name_md5"),
            sha2(col("r_name"), 256).as("name_sha256"))
          .orderBy(col("r_regionkey").asc_nulls_last),
      Some("""SELECT r_regionkey,
        CASE WHEN r_regionkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
        ifnull(nullif(r_name, 'REGION_0'), 'zero') AS name_or_zero,
        md5(r_name) AS name_md5,
        sha256(r_name) AS name_sha256
        FROM region ORDER BY r_regionkey ASC NULLS LAST""")))
}
