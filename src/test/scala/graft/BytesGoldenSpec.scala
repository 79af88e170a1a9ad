package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.server.QueryServer

/** Round-15 (verdict r14 ask #5): encoder-BYTES regression gate.
  *
  * The golden file (src/test/resources/bytes_golden_seed79.jsonl) is
  * 50 scalar-grammar queries whose HTTP response bytes — all four
  * formats — were verified against DuckDB's own renderings by
  * tools/bytes_check.py at capture time (seed 79, 2026-08-17: zero
  * VALUE divergences across 600×4 responses; residue classes are
  * documented conventions in COVERAGE.md). This spec replays the same
  * SQL through a real QueryServer and byte-compares every response,
  * so a rendering drift (CSV quoting, float text, nested-value
  * conventions, Arrow framing) fails CI-style naming the query and
  * format.
  *
  * After an INTENDED rendering change: regenerate via
  * `runMain graft.tools.BytesProbe /tmp/bytes.jsonl 600 79`, re-verify
  * with tools/bytes_check.py, and re-extract the first 50 all-200
  * lines into the resource.
  */
class BytesGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private var srv: QueryServer = _
  private var base: String = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    GraftExtensions.injectInto(spark)
    srv = new QueryServer(spark, 0, poolSize = 4, queryTimeoutMillis = 60000)
    srv.start()
    base = s"http://localhost:${srv.boundPort}/"
  }

  override def afterAll(): Unit = if (srv != null) srv.stop()

  private val formats = Seq(
    "csv" -> "text/csv",
    "json" -> "application/json",
    "jsonl" -> "application/jsonl",
    "arrow" -> "application/vnd.apache.arrow.stream")

  test("50 DuckDB-verified golden queries reproduce exact response bytes in all four formats") {
    val in = getClass.getResourceAsStream("/bytes_golden_seed79.jsonl")
    assert(in != null, "missing src/test/resources/bytes_golden_seed79.jsonl")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    assert(lines.size == 50)
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    lines.foreach { line =>
      // minimal JSON pull: the sql string and per-format b64 bodies
      val sql = {
        val m = """"sql":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(line).get.group(1)
        m.replace("\\\"", "\"").replace("\\\\", "\\")
          .replace("\\n", "\n").replace("\\t", "\t")
      }
      formats.foreach { case (key, accept) =>
        val want = Base64.getDecoder.decode(
          s""""$key":\\{"code":200,"b64":"([A-Za-z0-9+/=]*)"""".r
            .findFirstMatchIn(line).get.group(1))
        val req = HttpRequest.newBuilder(URI.create(base))
          .header("Accept", accept).header("Content-Type", "text/plain")
          .POST(HttpRequest.BodyPublishers.ofString(sql)).build()
        val r = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
        if (r.statusCode() != 200 || !java.util.Arrays.equals(r.body(), want))
          bad += s"[$key] $sql (code ${r.statusCode()}, ${r.body().length}B vs ${want.length}B golden)"
      }
    }
    assert(bad.isEmpty,
      s"${bad.size} responses drifted from the DuckDB-verified golden bytes:\n" +
        bad.take(6).mkString("\n"))
  }
}
