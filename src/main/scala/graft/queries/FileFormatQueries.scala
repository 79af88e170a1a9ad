package graft.queries

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 A — file-format scans beyond parquet: CSV with
  * header+type inference, NDJSON with inference, globbed
  * hive-partitioned directories with partition pruning (reference
  * surface: read_csv/read_json_auto/read_parquet + bare paths,
  * uquery-rs src/main.rs:304-368).
  *
  * Each query round-trips driver parquet through the format under
  * test and aggregates; the oracle aggregates the original parquet
  * table — so inference fidelity (types AND values) is what is being
  * hash-checked. Remote (https/s3/gcs) sources are documented
  * out-of-scope offline (SURVEY §2.2 A rows: httpfs/S3/GCS).
  */
object FileFormatQueries extends QueryModule {

  private def ioDir(dir: String, name: String): String =
    s"/tmp/graft_io/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/$name"

  // One fixture write per JVM (round-8 verdict #5): these queries cover
  // SCAN operators (header/type inference), but re-writing the text
  // fixture on every invocation made the benched time mostly write
  // throughput — a_csv_scan's 4.6 s was a 600k-row CSV write + double
  // read. The first invocation in a JVM still overwrites (so a stale
  // /tmp fixture from an older testdata generation can't poison the
  // hash check); bench min-of-2 and warm re-runs then measure the scan
  // the SURVEY row actually names.
  private val written = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def writeOnce(path: String)(write: => Unit): Unit =
    written.computeIfAbsent(path, { _ => write; path })

  override val queries: Seq[Q] = Seq(
    Q("a_csv_scan",
      "CSV write→scan with header detection + schema inference (str/int/double/timestamp all survive the text round-trip).",
      (s, dir) => {
        val path = ioDir(dir, "lineitem_csv")
        writeOnce(path) {
          T(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"), col("l_shipdate"))
            .write.mode("overwrite").option("header", "true").csv(path)
        }
        // inference samples 20% of rows — the schema must still come out
        // right (the values check below reads everything regardless); at
        // 100 TB you never type-infer over the full dataset
        s.read.option("header", "true").option("inferSchema", "true")
          .option("samplingRatio", "0.2").csv(path)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
               graft.Exact.sumExact(col("l_quantity")).as("qty"),
               max(col("l_shipdate")).as("last_ship"),
               max(col("l_orderkey")).as("max_key"))
          .orderBy(col("l_returnflag").asc_nulls_last)
      },
      Some("""SELECT l_returnflag, count(*) AS n, round(CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE), 2) AS qty,
        max(l_shipdate) AS last_ship, CAST(max(l_orderkey) AS INT) AS max_key
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag ASC NULLS LAST""")),

    Q("a_parquet_zstd_scan",
      "Parquet with zstd codec round-trip (the reference's fixture is test.zstd.parquet, uquery-rs src/main.rs:324-345): write a slice zstd-compressed, scan it back, aggregate against the uncompressed truth.",
      (s, dir) => {
        val path = ioDir(dir, "lineitem_zstd")
        writeOnce(path) {
          T(s, dir, "lineitem")
            .filter(col("l_orderkey") < 1000)
            .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
            .write.mode("overwrite").option("compression", "zstd").parquet(path)
        }
        s.read.parquet(path)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
               graft.Exact.sumExact(col("l_quantity")).as("qty"),
               max(col("l_orderkey")).as("max_key"))
          .orderBy(col("l_returnflag").asc_nulls_last)
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE), 2) AS qty,
        CAST(max(l_orderkey) AS INT) AS max_key
        FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_returnflag
        ORDER BY l_returnflag ASC NULLS LAST""")),

    Q("a_jsonl_scan",
      "NDJSON write→scan with inferred schema (timestamps round-trip as ISO strings → to_timestamp, the documented JSON-inference gap).",
      (s, dir) => {
        val path = ioDir(dir, "orders_jsonl")
        writeOnce(path) {
          T(s, dir, "orders")
            .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"), col("o_orderdate"))
            .write.mode("overwrite").json(path)
        }
        s.read.json(path)
          .withColumn("o_orderdate", to_timestamp(col("o_orderdate")))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
               graft.Exact.sumExact(col("o_totalprice")).as("total"),
               min(col("o_orderdate")).as("first_order"))
          .orderBy(col("o_orderstatus").asc_nulls_last)
      },
      Some("""SELECT o_orderstatus, count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE), 2) AS total,
        min(o_orderdate) AS first_order
        FROM orders GROUP BY o_orderstatus
        ORDER BY o_orderstatus ASC NULLS LAST""")),

    Q("a_partitioned_glob_scan",
      "Hive-partitioned write → directory scan with partition discovery; the status filter prunes partitions at plan time (PartitionFilters, not data filters).",
      (s, dir) => {
        val path = ioDir(dir, "orders_by_status")
        writeOnce(path) {
          T(s, dir, "orders")
            .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
        }
        s.read.parquet(path)
          .filter(col("o_orderstatus") === "O")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), graft.Exact.avgExact(col("o_totalprice")).as("avg_price"))
          .orderBy(col("o_orderpriority").asc_nulls_last)
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
        FROM orders WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority ASC NULLS LAST""")),

    Q("a_schema_evolution",
      "Schema-evolution scan: two parquet generations with DIFFERENT column sets (old: key+name, new: key+regionkey) read through mergeSchema — missing columns surface as NULLs, the union-by-name semantics a long-lived 100 TB dataset accumulates (DuckDB twin: read_parquet union_by_name).",
      (s, dir) => {
        val base = ioDir(dir, "evolution")
        writeOnce(base) {
          val nation = T(s, dir, "nation")
          nation.filter(col("n_nationkey") < 13)
            .select(col("n_nationkey"), col("n_name"))
            .write.mode("overwrite").parquet(s"$base/gen1")
          nation.filter(col("n_nationkey") >= 13)
            .select(col("n_nationkey"), col("n_regionkey"))
            .write.mode("overwrite").parquet(s"$base/gen2")
        }
        s.read.option("mergeSchema", "true")
          .parquet(s"$base/gen1", s"$base/gen2")
          .agg(count(lit(1)).as("n_rows"),
            count(col("n_name")).as("n_names"),
            count(col("n_regionkey")).as("n_regions"),
            sum(col("n_nationkey")).cast("long").as("key_sum"))
      },
      Some("""WITH m AS (
          SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey
          FROM nation WHERE n_nationkey < 13
          UNION ALL
          SELECT n_nationkey, CAST(NULL AS VARCHAR), n_regionkey
          FROM nation WHERE n_nationkey >= 13)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(n_name) AS BIGINT) AS n_names,
          CAST(count(n_regionkey) AS BIGINT) AS n_regions,
          CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        FROM m""")))
}
