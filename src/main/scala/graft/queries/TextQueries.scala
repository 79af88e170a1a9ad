package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text analysis over `documents` (builder-prompt
  * north-star ops): language-ID, quality scoring, token counting,
  * fingerprinting. Everything is per-row codegen'd expressions +
  * one hash aggregation — embarrassingly parallel, no shuffle except
  * the final group/sort, so it scales linearly to 100 TB of text.
  */
object TextQueries extends QueryModule {

  /** Stopword lists for the n-gram/stopword language heuristic. */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo"))

  override val queries: Seq[Q] = Seq(
    Q("n_text_stats",
      "Corpus quality statistics per language: char/word lengths, vocabulary richness.",
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("lang"), col("n_chars"),
            size(split(col("text"), " ")).as("n_words"),
            size(array_distinct(split(col("text"), " "))).as("n_uniq"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(col("n_chars")), 6).as("avg_chars"),
            round(avg(col("n_words")), 6).as("avg_words"),
            round(avg(col("n_uniq") / col("n_words")), 4).as("avg_ttr"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy(col("lang").asc_nulls_last),
      Some("""SELECT lang, count(*) AS n_docs,
        round(avg(n_chars), 6) AS avg_chars,
        round(avg(n_words), 6) AS avg_words,
        round(avg(CAST(n_uniq AS DOUBLE) / n_words), 4) AS avg_ttr,
        min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM (SELECT lang, n_chars,
                CAST(len(string_split(text, ' ')) AS INT) AS n_words,
                CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq
              FROM documents) t
        GROUP BY lang ORDER BY lang ASC NULLS LAST""")),

    Q("n_quality_score",
      "Per-document quality score: length, mean word length, stopword ratio, uniqueness — the standard pre-training filter features.",
      (s, dir) => {
        val en = array(stopwords("en").map(lit): _*)
        T(s, dir, "documents")
          .filter(col("doc_id") < 300)
          .withColumn("words", split(col("text"), " "))
          .select(
            col("doc_id"),
            col("n_chars"),
            size(col("words")).as("n_words"),
            round(col("n_chars").cast("double") / size(col("words")), 6).as("mean_word_len"),
            round(size(expr(s"filter(words, w -> array_contains(array(${stopwords("en").map("'" + _ + "'").mkString(",")}), w))"))
              .cast("double") / size(col("words")), 6).as("stopword_ratio"),
            round(size(array_distinct(col("words"))).cast("double") / size(col("words")), 6)
              .as("uniq_ratio"),
            (col("n_chars") >= 100 && size(col("words")) >= 20).as("passes_length_gate"))
          .orderBy(col("doc_id").asc_nulls_last)
      },
      Some("""SELECT doc_id, n_chars,
        CAST(len(words) AS INT) AS n_words,
        round(CAST(n_chars AS DOUBLE) / len(words), 6) AS mean_word_len,
        round(CAST(len(list_filter(words, w -> list_contains(['the','a','of','and','to'], w))) AS DOUBLE)
          / len(words), 6) AS stopword_ratio,
        round(CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 6) AS uniq_ratio,
        (n_chars >= 100 AND len(words) >= 20) AS passes_length_gate
        FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS words
              FROM documents WHERE doc_id < 300) t
        ORDER BY doc_id ASC NULLS LAST""")),

    Q("n_token_count",
      "Token counting: whitespace tokens + a BPE-ish regex tokenizer (words / digits / punctuation runs).",
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), "\\s+")).as("ws_tokens"),
            size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).as("bpe_tokens"))
          .groupBy()
          .agg(
            sum(col("ws_tokens")).as("total_ws_tokens"),
            sum(col("bpe_tokens")).as("total_bpe_tokens"),
            round(avg(col("bpe_tokens")), 6).as("avg_bpe_per_doc")),
      Some("""SELECT CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
        CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
        round(avg(bpe_tokens), 6) AS avg_bpe_per_doc
        FROM (SELECT
            CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS ws_tokens,
            CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS bpe_tokens
          FROM documents) t""")),

    Q("n_lang_id",
      "Heuristic language-ID: stopword-hit scoring per candidate language, argmax with deterministic tiebreak; confusion counts vs the labeled lang.",
      (s, dir) => {
        val scoreCols = stopwords.toSeq.sortBy(_._1).map { case (lg, words) =>
          val arr = words.map("'" + _ + "'").mkString(",")
          struct(
            size(expr(s"filter(words, w -> array_contains(array($arr), w))")).as("score"),
            lit(lg).as("lang")).as(s"s_$lg")
        }
        // r15: spread the single-split scan — the per-language stopword
        // HOF scoring is interpreted per-row CPU (§2.5)
        T.par(s, dir, "documents")
          .withColumn("words", split(col("text"), " "))
          .withColumn("cand", array(scoreCols: _*))
          // max by (score desc, lang asc): sort by (-score, lang) and take head
          .withColumn("best", expr(
            "array_sort(cand, (l, r) -> CASE WHEN l.score > r.score THEN -1 WHEN l.score < r.score THEN 1 " +
            "WHEN l.lang < r.lang THEN -1 WHEN l.lang > r.lang THEN 1 ELSE 0 END)[0]"))
          .groupBy(col("lang"), col("best.lang").as("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang").asc_nulls_last, col("pred_lang").asc_nulls_last)
      },
      Some("""WITH scored AS (
          SELECT lang,
            CAST(len(list_filter(words, w -> list_contains(['the','a','of','and','to'], w))) AS INT) AS sc_en,
            CAST(len(list_filter(words, w -> list_contains(['el','la','de','y','que'], w))) AS INT) AS sc_es,
            CAST(len(list_filter(words, w -> list_contains(['le','la','de','et','que'], w))) AS INT) AS sc_fr,
            CAST(len(list_filter(words, w -> list_contains(['der','die','das','und','zu'], w))) AS INT) AS sc_de,
            CAST(len(list_filter(words, w -> list_contains(['de','le','shi','bu','wo'], w))) AS INT) AS sc_zh
          FROM (SELECT lang, string_split(text, ' ') AS words FROM documents) t),
        best AS (
          SELECT lang,
            (SELECT b.lang FROM (VALUES (sc_de,'de'),(sc_en,'en'),(sc_es,'es'),(sc_fr,'fr'),(sc_zh,'zh')) b(score, lang)
             ORDER BY b.score DESC, b.lang ASC LIMIT 1) AS pred_lang
          FROM scored)
        SELECT lang, pred_lang, count(*) AS n FROM best
        GROUP BY lang, pred_lang
        ORDER BY lang ASC NULLS LAST, pred_lang ASC NULLS LAST""")),

    Q("n_fingerprint",
      "Document fingerprinting: md5 over the normalized sorted-unique vocabulary (cross-engine-stable); collisions = docs sharing a vocabulary set.",
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"),
            md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), " ")))))
              .as("vocab_fp"))
          .groupBy(col("vocab_fp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .filter(col("n_docs") > 1)
          .orderBy(col("n_docs").desc_nulls_last, col("vocab_fp").asc_nulls_last),
      Some("""SELECT vocab_fp, count(*) AS n_docs, min(doc_id) AS first_doc
        FROM (SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS vocab_fp
              FROM documents) t
        GROUP BY vocab_fp HAVING count(*) > 1
        ORDER BY n_docs DESC NULLS LAST, vocab_fp ASC NULLS LAST""")),

    Q("n_rolling_hash_fp",
      "Rolling polynomial hash fingerprint (Rabin-Karp-style) over word sequence — the scale path for shift-resistant chunk fingerprints. Portable md5-derived word hashes make the per-doc fingerprint oracle-checked exactly.",
      (s, dir) =>
        T(s, dir, "documents")
          .filter(col("doc_id") < 300)
          .select(col("doc_id"),
            expr("""aggregate(
                      transform(split(text, ' '),
                        w -> pmod(CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT), 2147483647)),
                      0L, (acc, h) -> pmod(acc * 31 + h, 2147483647))""")
              .as("rolling_fp"))
          .orderBy(col("doc_id").asc_nulls_last),
      // the DuckDB fold seeds list_reduce with a prepended 0 (it has no
      // initial-accumulator form); hex digits fold via the same trick
      Some("""SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ' '),
              w -> list_reduce(list_transform(range(1, 9),
                     i -> CAST(strpos('0123456789abcdef', substr(md5(w), i, 1)) - 1 AS BIGINT)),
                     (a, b) -> a * 16 + b) % 2147483647)),
            (acc, h) -> (acc * 31 + h) % 2147483647) AS rolling_fp
        FROM documents WHERE doc_id < 300
        ORDER BY doc_id ASC NULLS LAST""")),

    Q("n_bpe_pair_stats",
      "Tokenizer-training primitive — the first BPE merge step: top-50 adjacent character pairs by corpus frequency. Word frequencies aggregate FIRST (the relation drops to the vocabulary, not the corpus), then each DISTINCT word explodes its character bigrams weighted by frequency — at 100 TB the corpus is scanned once and all pair work happens on the vocab-bounded side.",
      (s, dir) =>
        T(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy(col("w")).agg(count(lit(1)).as("freq"))
          .select(explode(expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
            .as("pair"), col("freq"))
          .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("pair").asc_nulls_last)
          .limit(50),
      Some("""WITH words AS (
          SELECT w, count(*) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
          WHERE len(w) >= 2 GROUP BY w),
        pairs AS (
          SELECT substring(w, i, 2) AS pair, freq
          FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) g)
        SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair ASC LIMIT 50""")),

    Q("n_oov_rate",
      "Tokenizer vocabulary coverage: the top-500 corpus words (deterministic count-then-word tie-break) form the vocabulary, then each language reports its token count and out-of-vocabulary rate — the go/no-go check before freezing a tokenizer on a multilingual corpus. The vocab is top-K small so it BROADCASTS; the corpus side is one explode + two partial-aggregated shuffles (word counts, language rollup) — no all-pairs anything, linear to 100 TB.",
      (s, dir) => {
        val toks = T(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
        val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w").asc).limit(500)
          .select(col("w"), lit(1).as("in_vocab"))
        toks.join(broadcast(vocab), Seq("w"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_rate",
            round(col("n_oov").cast("double") / col("n_tokens"), 6))
          .orderBy(col("lang").asc_nulls_last)
      },
      Some("""WITH toks AS (
          SELECT lang, w FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) t
          WHERE len(w) > 0),
        vocab AS (
          SELECT w FROM (
            SELECT w, count(*) AS cnt FROM toks GROUP BY w
            ORDER BY cnt DESC, w ASC LIMIT 500) v)
        SELECT lang, count(*) AS n_tokens,
          CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          round(CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS oov_rate
        FROM toks LEFT JOIN vocab ON toks.w = vocab.w
        GROUP BY lang ORDER BY lang ASC NULLS LAST""")),

    Q("n_quality_unigram_lm",
      "Unigram language-model quality score (the CCNet/KenLM-style perplexity-proxy filter, reduced to its SQL-expressible core): train token frequencies on the WHOLE corpus, then score each document by bits-per-token = -(1/n)*sum(log2 p(w)) = log2(total) - avg(log2 cnt_w). Common-word prose scores low, gibberish and rare-token soup score high — the standard pre-training filter signal. Scale shape: the model is a token-keyed aggregate (NOT broadcast — vocab at 100 TB is huge), the scoring pass re-shuffles tokens once on the SAME key so the model join is co-partitioned, then one doc-keyed aggregate; everything partial-aggregates, nothing is quadratic.",
      (s, dir) => {
        val toks = T(s, dir, "documents")
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
          .filter(length(col("w")) > 0)
        val model = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        val total = toks.agg(count(lit(1)).as("total"))
        toks.join(model, Seq("w"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(log2(col("cnt"))).as("sumlog"))
          .crossJoin(broadcast(total))
          .filter(col("doc_id") < 300)
          .select(col("doc_id"), col("n_tokens"),
            round(log2(col("total")) - col("sumlog") / col("n_tokens"), 6)
              .as("bits_per_token"))
          .orderBy(col("doc_id").asc_nulls_last)
      },
      Some("""WITH toks AS (
          SELECT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents) t
          WHERE len(w) > 0),
        model AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
        tot AS (SELECT count(*) AS total FROM toks)
        SELECT doc_id, n_tokens,
          round(log2(total) - sumlog / n_tokens, 6) AS bits_per_token
        FROM (SELECT doc_id, count(*) AS n_tokens, sum(log2(cnt)) AS sumlog
              FROM toks JOIN model USING (w) GROUP BY doc_id) d, tot
        WHERE doc_id < 300
        ORDER BY doc_id ASC NULLS LAST""")))
}
