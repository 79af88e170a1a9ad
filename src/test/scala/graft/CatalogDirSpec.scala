package graft

import graft.server.QueryServer
import graft.sources.CatalogDir
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Attached-database workflow: the reference's tests/test.db ships a
  * `language` table plus a `test()` macro table; the catalog-dir
  * analog must serve the same queries over HTTP.
  */
class CatalogDirSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._
  import spark.implicits._

  private var srv: QueryServer = _
  private var base: String = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    // the reference fixture shape: language(Id, Name) — FIXTURES.md
    Seq((1, "Rust"), (2, "Scala"), (3, "SQL"))
      .toDF("Id", "Name")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/graft_catalog_build")
    // single-file layout like an attached table
    val built = new java.io.File("/tmp/graft_catalog_build").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(built.toPath,
      java.nio.file.Paths.get(dir, "language.parquet"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "init.sql"),
      """CREATE TEMPORARY VIEW test AS SELECT Id, Name FROM language WHERE Id <= 2;
        |CREATE OR REPLACE TEMPORARY FUNCTION double_id(x INT) RETURNS INT RETURN x * 2""".stripMargin)
    val names = CatalogDir.attach(spark, dir)
    assert(names == Seq("language"))
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

  test("attached table is queryable (ref: src/main.rs:230-259)") {
    val r = post("SELECT Name FROM language ORDER BY Id")
    assert(r.statusCode() == 200)
    assert(r.body() == "[{\"Name\":\"Rust\"},{\"Name\":\"Scala\"},{\"Name\":\"SQL\"}]")
  }

  test("macro table from init.sql is queryable (ref: src/main.rs:413-450)") {
    val r = post("SELECT count(*) AS n FROM test")
    assert(r.statusCode() == 200 && r.body() == "[{\"n\":2}]")
  }

  test("scalar macro from init.sql applies") {
    val r = post("SELECT double_id(21) AS v")
    assert(r.statusCode() == 200 && r.body() == "[{\"v\":42}]")
  }

  test("statement splitter respects quoted semicolons") {
    assert(CatalogDir.splitStatements("SELECT ';' AS x; SELECT 1") ==
      Seq("SELECT ';' AS x", "SELECT 1"))
  }
}
