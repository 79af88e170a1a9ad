package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.server.QueryServer

/** Round-15 (verdict r14 ask #5): fuzz the ENCODER BYTES, not just
  * canonical values.
  *
  * The four HTTP stream encoders (CSV / JSON array / JSON Lines /
  * Arrow IPC) are pinned by hand-picked goldens, and fuzz_check.py
  * compares canonical ROWS — so rendering divergences (CSV quoting
  * edges, JSON float shortest-round-trip, interval/timestamp text,
  * nested-value rendering) in fuzzed shapes were unchecked. This main
  * generates n scalar-grammar queries (FuzzProbe.genQuery — the same
  * deterministic corpus discipline), POSTs each through a REAL
  * QueryServer once per format, and dumps the raw response bytes
  * (base64) as JSONL. tools/bytes_check.py replays the same SQL in
  * DuckDB, renders with DuckDB's OWN COPY TO (CSV/JSON/NDJSON) and
  * pyarrow (Arrow), and byte-diffs (value-diffs for Arrow, which has
  * no canonical byte framing) — every divergence lands in a ledger as
  * a fix or a documented convention class.
  *
  * Usage: runMain graft.tools.BytesProbe <out.jsonl> [n] [seed]
  */
object BytesProbe {

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/bytes.jsonl"
    val n = if (args.length > 1) args(1).toInt else 1000
    val seed = if (args.length > 2) args(2).toLong else 77L
    val spark = graft.GraftSession.tune(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.injectInto(spark)
    val srv = new QueryServer(spark, 0, poolSize = 4, queryTimeoutMillis = 120000)
    srv.start()
    val base = s"http://localhost:${srv.boundPort}/"
    val client = HttpClient.newHttpClient()
    val formats = Seq(
      "csv" -> "text/csv",
      "json" -> "application/json",
      "jsonl" -> "application/jsonl",
      "arrow" -> "application/vnd.apache.arrow.stream")

    def post(sql: String, accept: String): (Int, Array[Byte]) = {
      val req = HttpRequest.newBuilder(URI.create(base))
        .header("Accept", accept).header("Content-Type", "text/plain")
        .POST(HttpRequest.BodyPublishers.ofString(sql)).build()
      val r = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      (r.statusCode(), r.body())
    }

    val rng = new Random(seed)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val sql = FuzzProbe.genQuery(rng)
      val parts = formats.map { case (key, accept) =>
        val (code, body) = post(sql, accept)
        s""""$key":{"code":$code,"b64":"${Base64.getEncoder.encodeToString(body)}"}"""
      }
      sb.append(s"""{"id":$i,"sql":${FuzzProbe.js(sql)},${parts.mkString(",")}}""").append('\n')
      if (i % 200 == 0) System.err.println(s"[bytes] $i/$n")
      i += 1
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[bytes] wrote $n x ${formats.size} responses to $out (seed=$seed)")
    srv.stop()
    spark.stop()
  }
}
