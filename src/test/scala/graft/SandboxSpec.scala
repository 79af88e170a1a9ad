package graft

import graft.server.QueryServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Filesystem sandbox: allowed-directories enforcement at the
  * analyzed-plan level (ref: uquery-rs SET allowed_directories,
  * src/cli/options.rs:193-199).
  */
class SandboxSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private var srv: QueryServer = _
  private var base: String = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    T.views(spark, sf, "nation")
    srv = new QueryServer(spark, 0, allowedDirs = Seq("/root/testdata"))
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

  test("reads under allowed dirs succeed") {
    val r = post("SELECT count(*) AS n FROM parquet.`/root/testdata/sf0.001/region.parquet`")
    assert(r.statusCode() == 200 && r.body() == "[{\"n\":5}]")
  }

  test("view-backed reads (rooted in allowed dirs) succeed") {
    assert(post("SELECT count(*) AS n FROM nation").statusCode() == 200)
  }

  test("eagerly-executed commands are rejected under the sandbox") {
    val r = post("CREATE TABLE sneak AS SELECT * FROM parquet.`/etc/hosts`")
    assert(r.statusCode() == 400)
    assert(r.body().contains("read-only"))
  }

  test("direct file reads outside allowed dirs are rejected with 400") {
    val r = post("SELECT * FROM csv.`/etc/hosts`")
    assert(r.statusCode() == 400)
    assert(r.body().contains("outside allowed directories"))
  }

  test("sibling directories sharing the allowed prefix are rejected") {
    // /root/testdata must NOT admit /root/testdata-evil (string-prefix
    // matching would; containment is per path component)
    val evil = new java.io.File("/tmp/graft_sandbox/data-evil")
    evil.mkdirs()
    val f = new java.io.File(evil, "x.csv")
    java.nio.file.Files.writeString(f.toPath, "a,b\n1,2\n")
    val srv2 = new QueryServer(spark, 0, allowedDirs = Seq("/tmp/graft_sandbox/data"))
    srv2.start()
    try {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${srv2.boundPort}/"))
          .header("Accept", "application/json").header("Content-Type", "text/plain")
          .POST(HttpRequest.BodyPublishers.ofString(
            s"SELECT * FROM csv.`${f.getAbsolutePath}`")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 400)
      assert(r.body().contains("outside allowed directories"))
    } finally srv2.stop()
  }

  test("symlinks inside an allowed dir pointing outside it are rejected") {
    // lexical normalization alone would pass this path; containment
    // must run on the RESOLVED (toRealPath) location
    val dir = new java.io.File("/tmp/graft_sandbox/linked")
    dir.mkdirs()
    val link = new java.io.File(dir, "sneaky.csv").toPath
    java.nio.file.Files.deleteIfExists(link)
    java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get("/etc/hosts"))
    val srv2 = new QueryServer(spark, 0, allowedDirs = Seq(dir.getAbsolutePath))
    srv2.start()
    try {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${srv2.boundPort}/"))
          .header("Accept", "application/json").header("Content-Type", "text/plain")
          .POST(HttpRequest.BodyPublishers.ofString(
            s"SELECT * FROM csv.`$link`")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 400)
      assert(r.body().contains("outside allowed directories"))
    } finally srv2.stop()
  }
}
