package graft

import graft.server.QueryServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `COPY … TO` over HTTP — DuckDB's export verb, reachable through the
  * reference's POST / whenever no sandbox applies. Golden bytes below
  * are PINNED from DuckDB 1.x on the same VALUES relation: one-row
  * Count result, header-by-default CSV with NULL rendered empty,
  * newline-delimited JSON with explicit nulls, extension-inferred
  * format, overwrite-in-place, loud unknown options.
  */
class CopySpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private var srv: QueryServer = _
  private var base: String = _
  private val client = HttpClient.newHttpClient()
  private val dir = Files.createTempDirectory("graft_copy_spec").toString

  override def beforeAll(): Unit = {
    T.views(spark, sf, "nation")
    srv = new QueryServer(spark, 0)
    srv.start()
    base = s"http://localhost:${srv.boundPort}"
  }

  override def afterAll(): Unit = if (srv != null) srv.stop()

  private def post(sql: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"$base/"))
        .header("Accept", "application/json").header("Content-Type", "text/plain")
        .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
      HttpResponse.BodyHandlers.ofString())

  private val rel =
    "(VALUES (1, 'a,x', CAST(NULL AS DOUBLE)), (2, 'b', 3.5)) v(i, s, d)"

  test("COPY table TO parquet: Count ack, exact single file, round-trips") {
    val p = s"$dir/nation.parquet"
    val r = post(s"COPY nation TO '$p'")
    assert(r.statusCode() == 200, r.body())
    assert(r.body() == """[{"Count":25}]""")
    assert(Files.isRegularFile(Paths.get(p)))
    val back = spark.read.parquet(p)
    assert(back.count() == 25)
    assert(back.columns.toSeq == T(spark, sf, "nation").columns.toSeq)
  }

  test("COPY (query) TO csv: DuckDB golden bytes (header, quoting, empty NULL)") {
    val p = s"$dir/vals.csv"
    val r = post(s"COPY (SELECT * FROM $rel) TO '$p'")
    assert(r.statusCode() == 200, r.body())
    assert(r.body() == """[{"Count":2}]""")
    val got = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
    assert(got == "i,s,d\n1,\"a,x\",\n2,b,3.5\n", s"got: <$got>")
  }

  test("HEADER false and DELIMITER option") {
    val p = s"$dir/vals2.csv"
    val r = post(s"COPY (SELECT i, s FROM $rel) TO '$p' (HEADER false, DELIMITER ';')")
    assert(r.statusCode() == 200, r.body())
    val got = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
    assert(got == "1;a,x\n2;b\n", s"got: <$got>")
  }

  test("FORMAT JSON writes newline-delimited objects with explicit nulls") {
    val p = s"$dir/vals.json"
    val r = post(s"COPY (SELECT * FROM $rel) TO '$p'")
    assert(r.statusCode() == 200, r.body())
    val got = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
    assert(got == "{\"i\":1,\"s\":\"a,x\",\"d\":null}\n{\"i\":2,\"s\":\"b\",\"d\":3.5}\n",
      s"got: <$got>")
  }

  test("COPY overwrites an existing file, like DuckDB") {
    val p = s"$dir/ow.csv"
    post(s"COPY (SELECT 1 AS i) TO '$p' (HEADER false)")
    post(s"COPY (SELECT 9 AS i) TO '$p' (HEADER false)")
    assert(new String(Files.readAllBytes(Paths.get(p)), "UTF-8") == "9\n")
  }

  test("unknown writer option is a loud binder-style error") {
    val r = post(s"COPY (SELECT 1 AS i) TO '$dir/x.csv' (BOGUS 1)")
    assert(r.statusCode() >= 400)
    assert(r.body().toLowerCase.contains("bogus"))
  }

  test("COPY PARTITION_BY writes DuckDB's hive directory layout and round-trips") {
    val p = s"$dir/part_out"
    val r = post(
      s"COPY (SELECT * FROM $rel) TO '$p' (FORMAT PARQUET, PARTITION_BY (i))")
    assert(r.statusCode() == 200, r.body())
    assert(r.body() == """[{"Count":2}]""")
    // DuckDB writes path/col=value/…; Spark's partitionBy is the same
    // hive layout — the two engines' outputs are directory-compatible
    assert(Files.isDirectory(Paths.get(s"$p/i=1")))
    assert(Files.isDirectory(Paths.get(s"$p/i=2")))
    val back = spark.read.parquet(p)
    assert(back.count() == 2)
    assert(back.select("s").orderBy("s").collect().map(_.getString(0)).toSeq
      == Seq("a,x", "b"))
    // multi-column spelling parses through the paren-aware option split
    val r2 = post(
      s"COPY (SELECT * FROM $rel) TO '$dir/part2' (PARTITION_BY (i, s), FORMAT PARQUET)")
    assert(r2.statusCode() == 200, r2.body())
    assert(spark.read.parquet(s"$dir/part2").count() == 2)
  }

  test("sandboxed server rejects COPY writes outside allowed dirs") {
    val srv2 = new QueryServer(spark, 0, allowedDirs = Seq("/root/testdata"))
    srv2.start()
    try {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${srv2.boundPort}/"))
          .header("Accept", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            s"COPY (SELECT 1 AS i) TO '$dir/sneak.csv'")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() >= 400)
      assert(!Files.exists(Paths.get(s"$dir/sneak.csv")))
    } finally srv2.stop()
  }
}
