package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star ops): media as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * partition passes.
  *
  * The container has no image/audio codecs, so `decode` is a
  * clearly-marked deterministic STUB (graft.operators.MediaDecode) —
  * but the Spark-side plumbing is real: binary payload column, typed
  * metadata struct, per-partition batched extraction with a fixed
  * feature schema, partition-count-independent results. Swapping the
  * stub for a real codec changes no plumbing. (PySpark equivalent:
  * `mapInPandas` with an arrow-batched UDF; in Scala the same batch
  * shape is `Dataset.mapPartitions`.)
  */
object MultimodalQueries extends QueryModule {

  override val queries: Seq[Q] = Seq(
    Q("m_binary_metadata",
      "Media ingestion: payload as binary + typed metadata struct (size, digest, mime); metadata aggregates per source.",
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            col("text").cast("binary").as("payload"))
          .select(col("doc_id"), col("source"),
            struct(
              octet_length(col("payload")).as("n_bytes"),
              md5(col("payload")).as("digest"),
              lit("text/plain").as("mime")).as("meta"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("meta.n_bytes")).as("total_bytes"),
            countDistinct(col("meta.digest")).as("n_distinct_payloads"))
          .orderBy(col("source").asc_nulls_last),
      Some("""SELECT source, count(*) AS n_media,
        CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        count(DISTINCT md5(text)) AS n_distinct_payloads
        FROM documents GROUP BY source
        ORDER BY source ASC NULLS LAST""")),

    Q("m_decode_features",
      "Decode + feature-extract over binary payloads via batched partition passes (STUB decoder, real plumbing). Oracle-exempt: decoder is a Spark-side stub.",
      (s, dir) => graft.operators.MediaDecode.extractFeatures(
        T(s, dir, "documents")
          .select(col("doc_id"),
            col("text").cast("binary").as("payload"))),
      None))
}
