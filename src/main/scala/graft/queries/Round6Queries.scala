package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Round-6 additions: quality-aware duplicate resolution — the
  * production dedup policy (keep the BEST member of each near-dup
  * cluster, not an arbitrary one) layered on the existing verified
  * pair graph + connected components.
  */
object Round6Queries extends QueryModule {

  override val queries: Seq[Q] = Seq(
    Q("n_dedup_keep_best",
      "Quality-aware near-dup survivorship: connected components over the verified Jaccard>=0.5 pair graph, then each cluster keeps its HIGHEST-QUALITY member (longest doc; ties break to min doc_id) instead of the arbitrary min-id — the policy real training pipelines use, since near-dup groups usually contain one full document and several truncated copies. Scale shape: the pair graph and CC fixpoint are the existing linear machinery; the survivor pick adds two label-keyed partial aggregates and one co-partitioned self-join — nothing quadratic, nothing collected.",
      (s, dir) => {
        val labels = DedupQueries.clusterLabels(s, dir)
        val docs = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        val members = labels.join(docs, labels("id") === docs("doc_id"))
          .select(col("label"), col("doc_id"), col("n_chars"))
        val best = members.groupBy(col("label"))
          .agg(max(col("n_chars")).as("kept_chars"), count(lit(1)).as("n_members"))
        members.join(best, "label")
          .filter(col("n_chars") === col("kept_chars"))
          .groupBy(col("label").as("cluster_id"), col("kept_chars"), col("n_members"))
          .agg(min(col("doc_id")).as("kept_doc"))
          .select(col("cluster_id"), col("kept_doc"), col("kept_chars"),
            col("n_members"))
          .orderBy(col("cluster_id").asc_nulls_last)
      },
      Some("""WITH RECURSIVE sh AS (
          SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
               LATERAL (SELECT unnest(generate_series(0, len(w) - 3)) AS i) g),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        cpairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        jp AS (
          SELECT id_a, id_b FROM cpairs
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM jp
          UNION SELECT id_b, id_a FROM jp),
        reach AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        labels AS (
          SELECT u AS id, least(u, min(v)) AS label FROM reach GROUP BY u),
        members AS (
          SELECT l.label, l.id AS doc_id, d.n_chars
          FROM labels l JOIN documents d ON d.doc_id = l.id),
        best AS (
          SELECT label, max(n_chars) AS kept_chars, count(*) AS n_members
          FROM members GROUP BY label)
        SELECT m.label AS cluster_id, min(m.doc_id) AS kept_doc,
          b.kept_chars, b.n_members
        FROM members m JOIN best b ON m.label = b.label AND m.n_chars = b.kept_chars
        GROUP BY m.label, b.kept_chars, b.n_members
        ORDER BY cluster_id ASC NULLS LAST""")))
}
