package graft.server

import org.apache.spark.sql.SparkSession

/** Built-in TABLE-MACRO library serving the flagship pipeline
  * operators over POST / (VERDICT r11 ask #3).
  *
  * The reference's only entry point is SQL text over HTTP
  * (uquery-rs src/core/duckdb.rs:87), and its only user-extension
  * mechanism is macros (docs/docs/advanced-tutorials/
  * custom-database.md:8,28) — so the pipeline inventory becomes
  * reachable from a reference client the same way: each operator is a
  * table macro whose body is DuckDB-dialect SQL, registered through
  * the SAME runtime machinery a client's own CREATE MACRO uses. Bodies
  * are bind-time templates: `tbl` substitutes textually, so
  * `SELECT * FROM exact_dedup(documents)` (or any view/read_parquet
  * relation) works, and every DuckDB-ism inside flows through the full
  * dialect pipeline at use time — including the sandbox check on any
  * file path an argument smuggles in.
  *
  * The DataFrame programs in graft.queries stay the first-party
  * implementations; these macros re-express the same portable
  * constructions (md5 token hashes, affine MinHash permutations,
  * SimHash bit votes, BM25 with exact decimal sums) in served SQL.
  * PipelineMacroSpec proves each macro's HTTP result equals the
  * corresponding SparkEntry program's output row-for-row.
  */
object PipelineMacros {

  /** 32-bit md5-derived token hash — the portable construction every
    * oracle-checked sketch uses (Round2Queries.duckTokHash spelling,
    * which the dialect shim executes natively).
    */
  private val tokHash =
    """list_reduce(list_transform(range(1, 9),
      |  i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT)),
      |  (a, b) -> a * 16 + b)""".stripMargin

  private val tokens =
    "list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != ''))"

  private[graft] val library: Seq[String] = Seq(
    // exact dedup: only 16-byte digests group, never bodies
    """CREATE OR REPLACE MACRO exact_dedup(tbl) AS TABLE
       SELECT min(doc_id) AS keep_id, count(*) AS n_copies
       FROM tbl GROUP BY md5(text)""",

    // portable MinHash-4 signatures (affine permutations mod 2^31-1)
    s"""CREATE OR REPLACE MACRO minhash_signatures(tbl) AS TABLE
       SELECT doc_id,
         list_min(list_transform(hs, h -> (131 * h + 7) % 2147483647)) AS s0,
         list_min(list_transform(hs, h -> (137 * h + 11) % 2147483647)) AS s1,
         list_min(list_transform(hs, h -> (139 * h + 13) % 2147483647)) AS s2,
         list_min(list_transform(hs, h -> (149 * h + 17) % 2147483647)) AS s3
       FROM (SELECT doc_id,
               list_transform($tokens, t -> $tokHash % 2147483647) AS hs
             FROM tbl) toks""",

    // portable SimHash-32 signatures (per-token hash bits vote)
    s"""CREATE OR REPLACE MACRO simhash_signatures(tbl) AS TABLE
       SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32), b ->
           CASE WHEN list_sum(list_transform(hs, h ->
                  CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
                THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS sig32
       FROM (SELECT doc_id, list_transform($tokens, t -> $tokHash) AS hs
             FROM tbl) toks""",

    // pre-training quality features (length / word stats / stopword +
    // uniqueness ratios + the length gate)
    """CREATE OR REPLACE MACRO quality_score(tbl) AS TABLE
       SELECT doc_id, n_chars,
         CAST(len(words) AS INT) AS n_words,
         round(CAST(n_chars AS DOUBLE) / len(words), 6) AS mean_word_len,
         round(CAST(len(list_filter(words, w -> list_contains(['the','a','of','and','to'], w))) AS DOUBLE)
           / len(words), 6) AS stopword_ratio,
         round(CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 6) AS uniq_ratio,
         (n_chars >= 100 AND len(words) >= 20) AS passes_length_gate
       FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS words FROM tbl) t""",

    // corpus token budget: whitespace + BPE-ish regex token counts.
    // NOTE stored bodies bypass rewriteStringEscapes (they splice in
    // after it), so the regexes carry Spark escape spelling (doubled
    // backslashes) — and no SQL comments inside bodies: an apostrophe
    // in a comment would unbalance the quote mask at splice time
    """CREATE OR REPLACE MACRO token_count(tbl) AS TABLE
       SELECT CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
         CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
         round(avg(bpe_tokens), 6) AS avg_bpe_per_doc
       FROM (SELECT
           CAST(len(regexp_split_to_array(text, '\\s+')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS bpe_tokens
         FROM tbl) t""",

    // Okapi BM25 (k1=1.2, b=0.75): the query is qid's distinct word
    // set; per-term contributions round to fixed scale and sum exactly
    """CREATE OR REPLACE MACRO bm25_topk(tbl, qid, k) AS TABLE
       WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> len(w) > 0) AS words FROM tbl),
         dl AS (SELECT doc_id, len(words) AS dl FROM d),
         st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         tf AS (SELECT t.doc_id, dl.dl, t.w, count(*) AS tf
                FROM (SELECT doc_id, unnest(words) AS w FROM d) t JOIN dl ON t.doc_id = dl.doc_id
                GROUP BY t.doc_id, dl.dl, t.w),
         dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         q AS (SELECT DISTINCT unnest(words) AS w FROM d WHERE doc_id = qid),
         sc AS (SELECT tf.doc_id,
             round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 8)
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS raw
           FROM tf JOIN q ON tf.w = q.w JOIN dfq ON tf.w = dfq.w CROSS JOIN st)
       SELECT doc_id, count(*) AS n_terms,
         round(CAST(sum(CAST(round(raw, 8) AS DECIMAL(20,8))) AS DOUBLE), 6) AS score
       FROM sc GROUP BY doc_id
       ORDER BY score DESC NULLS LAST, doc_id ASC NULLS LAST LIMIT k""",

    // round-13 (verdict ask #6): the ANN/miner tier served. The
    // 8-hyperplane signature is EXACTLY n_ann_lsh_portable's authored
    // plane set (graft.queries.Round2Queries.lshPlanes), rendered into
    // the body at install time; candidates are bucket cohabitants —
    // the equi-join tier the _ann miners build on (multi-probe masks
    // stay the engine path, Round12Queries)
    s"""CREATE OR REPLACE MACRO ann_candidates(tbl) AS TABLE
       WITH sigs AS (SELECT vec_id, $lshSigSql AS sig FROM tbl)
       SELECT a.sig AS sig, a.vec_id AS id_a, b.vec_id AS id_b
       FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id""",

    // sentence-digest decontamination screen (the Gopher/GPT-3 exact
    // screen at sentence grain): a corpus doc is flagged when any of
    // its >=20-char sentences digest-matches an eval-set sentence —
    // digests cross the join, never text. Regexes carry Spark escape
    // spelling (stored bodies splice in after rewriteStringEscapes)
    """CREATE OR REPLACE MACRO decontam_screen(tbl, evaltbl) AS TABLE
       WITH cs AS (SELECT doc_id, md5(trim(s)) AS dig
                   FROM (SELECT doc_id, unnest(string_split_regex(text, '\\.\\s+')) AS s FROM tbl) z
                   WHERE len(trim(s)) >= 20),
         es AS (SELECT DISTINCT md5(trim(s)) AS dig
                FROM (SELECT unnest(string_split_regex(text, '\\.\\s+')) AS s FROM evaltbl) z
                WHERE len(trim(s)) >= 20)
       SELECT DISTINCT cs.doc_id AS doc_id FROM cs JOIN es ON cs.dig = es.dig""",

    // Bradley-Terry preference fit (Hunter 2004 MM, two iterations
    // from p=1) — the served twin of n_pref_bradley_terry: identical
    // comparison extraction (consecutive same-user events, higher
    // value wins, ties dropped), identical exact-decimal denominator
    // discipline, so PipelineMacroSpec asserts row equality
    """CREATE OR REPLACE MACRO bradley_terry(tbl) AS TABLE
       WITH c0 AS (SELECT event_type, value,
             lag(event_type) OVER w AS prev_type,
             lag(value) OVER w AS prev_value
           FROM tbl
           WINDOW w AS (PARTITION BY user_id
             ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)),
         comps AS (SELECT
             CASE WHEN value > prev_value THEN event_type ELSE prev_type END AS winner,
             CASE WHEN value > prev_value THEN prev_type ELSE event_type END AS loser
           FROM c0 WHERE prev_type IS NOT NULL
             AND prev_type <> event_type AND value <> prev_value),
         pw AS (SELECT winner, loser, count(*) AS n FROM comps GROUP BY winner, loser),
         games AS (SELECT a, b, CAST(sum(n) AS BIGINT) AS g FROM (
             SELECT winner AS a, loser AS b, n FROM pw
             UNION ALL SELECT loser AS a, winner AS b, n FROM pw) u GROUP BY a, b),
         wins AS (SELECT winner AS a, CAST(sum(n) AS BIGINT) AS w FROM pw GROUP BY winner),
         base AS (SELECT t.a, t.games, coalesce(wins.w, 0) AS w
           FROM (SELECT a, CAST(sum(g) AS BIGINT) AS games FROM games GROUP BY a) t
           LEFT JOIN wins ON t.a = wins.a),
         p0 AS (SELECT a, CAST(1.0 AS DOUBLE) AS p FROM base),
         s1 AS (SELECT t.a, round(b.w / t.den, 6) AS p FROM (
             SELECT g.a, CAST(sum(CAST(round(g.g / (pa.p + pb.p), 6) AS DECIMAL(18,6))) AS DOUBLE) AS den
             FROM games g JOIN p0 pa ON g.a = pa.a JOIN p0 pb ON g.b = pb.a
             GROUP BY g.a) t JOIN base b ON t.a = b.a),
         s2 AS (SELECT t.a, round(b.w / t.den, 6) AS p FROM (
             SELECT g.a, CAST(sum(CAST(round(g.g / (pa.p + pb.p), 6) AS DECIMAL(18,6))) AS DOUBLE) AS den
             FROM games g JOIN s1 pa ON g.a = pa.a JOIN s1 pb ON g.b = pb.a
             GROUP BY g.a) t JOIN base b ON t.a = b.a),
         tot AS (SELECT CAST(sum(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS ptot FROM s2)
       SELECT b.a AS item, b.w AS wins, b.games AS games,
         round(s2.p / tot.ptot, 6) AS strength,
         row_number() OVER (ORDER BY round(s2.p / tot.ptot, 6) DESC NULLS LAST,
           b.a ASC NULLS LAST) AS rank
       FROM s2 JOIN base b ON s2.a = b.a CROSS JOIN tot""")

  /** The authored 8-plane signature as served SQL — the same integer
    * hyperplanes n_ann_lsh_portable renders into both engines. */
  private def lshSigSql: String =
    graft.queries.Round2Queries.lshPlanes.zipWithIndex.map { case (hp, b) =>
      val lst = hp.mkString("[", ", ", "]")
      s"""(CASE WHEN list_dot_product($lst, embedding) >= 0
          THEN ${1L << b} ELSE 0 END)"""
    }.mkString("\n         + ")

  /** Register the library into `spark`'s macro registry — the same
    * code path a posted CREATE MACRO takes (QueryServer installs this
    * at start; a client can still shadow any name with OR REPLACE).
    */
  def install(spark: SparkSession): Unit =
    library.foreach(ddl => Dialect.rewrite(spark, ddl))
}
