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
       ORDER BY score DESC NULLS LAST, doc_id ASC NULLS LAST LIMIT k""")

  /** Register the library into `spark`'s macro registry — the same
    * code path a posted CREATE MACRO takes (QueryServer installs this
    * at start; a client can still shadow any name with OR REPLACE).
    */
  def install(spark: SparkSession): Unit =
    library.foreach(ddl => Dialect.rewrite(spark, ddl))
}
