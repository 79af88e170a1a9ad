package graft

import graft.server.QueryServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Runtime `CREATE MACRO` over the HTTP endpoint (VERDICT r3 #2) and
  * PIVOT-enumeration admission control (VERDICT r3 #3).
  *
  * The macro flow reproduces the reference's custom-database walkthrough
  * (uquery-rs docs/docs/advanced-tutorials/custom-database.md:28:
  * `create macro nytemp() as table select * from read_csv(...)` then
  * `select * from nytemp() limit 10` over POST /) and the table-macro
  * test shipped in tests/test.db (src/main.rs:413-450).
  */
class MacroSpec extends AnyFunSuite with BeforeAndAfterAll {

  // dedicated session: the macro registry is session-scoped, so this
  // suite can never leak macros into (or see views from) other suites
  private lazy val session = GraftSession.tune(TestSpark.spark.newSession())
  private var srv: QueryServer = _
  private var srvOne: QueryServer = _ // poolSize=1, short timeout — admission tests
  private var base: String = _
  private var baseOne: String = _
  private val client = HttpClient.newHttpClient()
  private var csvPath: String = _

  override def beforeAll(): Unit = {
    session.udf.register("sleep_ms", (ms: Int) => { Thread.sleep(ms.toLong); ms })
    // the walkthrough's sensor CSV, miniaturized
    val tmp = java.nio.file.Files.createTempDirectory("graft_macro")
    csvPath = tmp.resolve("ny-temperature.csv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csvPath),
      "sensor_id,air_temp,borough\nBk-BR_01,71.189,Brooklyn\nMn-01_02,72.5,Manhattan\n")
    // a view whose enumeration column takes >timeout to compute
    session.sql("SELECT sleep_ms(20000) AS g, 1 AS v").createOrReplaceTempView("slowpiv")
    session.sql("SELECT * FROM VALUES ('a', 1), ('b', 2) AS t(g, v)").createOrReplaceTempView("fastpiv")
    srv = new QueryServer(session, 0, poolSize = 4, queryTimeoutMillis = 10000)
    srv.start()
    base = s"http://localhost:${srv.boundPort}"
    srvOne = new QueryServer(session, 0, poolSize = 1, queryTimeoutMillis = 2000)
    srvOne.start()
    baseOne = s"http://localhost:${srvOne.boundPort}"
  }

  override def afterAll(): Unit = {
    if (srv != null) srv.stop()
    if (srvOne != null) srvOne.stop()
  }

  private def post(b: String, at: String = null, accept: String = "application/json"): HttpResponse[Array[Byte]] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"${if (at == null) base else at}/"))
        .header("Accept", accept).header("Content-Type", "text/plain")
        .POST(HttpRequest.BodyPublishers.ofString(b)).build(),
      HttpResponse.BodyHandlers.ofByteArray())

  test("custom-database walkthrough: table macro over read_csv, used via FROM f()") {
    val c = post(s"create macro nytemp() as table select * from read_csv('$csvPath')")
    assert(c.statusCode() == 200)
    assert(new String(c.body(), "UTF-8") == "[]") // DuckDB: CREATE MACRO yields an empty result
    val r = post("select * from nytemp() limit 10", accept = "text/csv")
    assert(r.statusCode() == 200)
    val lines = new String(r.body(), "UTF-8").trim.split("\n").toSeq
    assert(lines.head == "sensor_id,air_temp,borough")
    assert(lines.contains("Bk-BR_01,71.189,Brooklyn") && lines.size == 3)
  }

  test("legacy `CREATE MACRO TABLE f()` spelling (the reference's tests/test.db vintage)") {
    val c = post("create macro table legacy_t() as select 'abc' AS f_str, 123 AS f_int")
    assert(c.statusCode() == 200)
    val r = post("SELECT * from legacy_t()")
    assert(new String(r.body(), "UTF-8") == "[{\"f_str\":\"abc\",\"f_int\":123}]")
  }

  test("scalar macro with := default; untyped params serve ints and strings alike") {
    assert(post("create macro pad2(x, fill := '0')").statusCode() == 400) // missing AS → loud
    assert(post("create macro add2(a, b := 10) as a + b").statusCode() == 200)
    val r1 = post("SELECT add2(5) AS s")
    assert(new String(r1.body(), "UTF-8") == "[{\"s\":15}]")
    val r2 = post("SELECT add2(1, 2) AS s")
    assert(new String(r2.body(), "UTF-8") == "[{\"s\":3}]")
    // same macro, double operands — no declared types to fight
    val r3 = post("SELECT add2(0.5, 0.25) AS s")
    assert(new String(r3.body(), "UTF-8") == "[{\"s\":0.75}]")
  }

  test("macro referencing a macro expands; OR REPLACE rebinds; DROP removes") {
    assert(post("create macro base_v() as 21").statusCode() == 200)
    assert(post("create macro dbl() as base_v() * 2").statusCode() == 200)
    assert(new String(post("SELECT dbl() AS d").body(), "UTF-8") == "[{\"d\":42}]")
    assert(post("create or replace macro base_v() as 100").statusCode() == 200)
    assert(new String(post("SELECT dbl() AS d").body(), "UTF-8") == "[{\"d\":200}]")
    assert(post("drop macro dbl").statusCode() == 200)
    assert(post("SELECT dbl() AS d").statusCode() == 400) // unresolved function → loud
    assert(post("drop macro dbl").statusCode() == 400)    // already gone, no IF EXISTS
    assert(post("drop macro if exists dbl").statusCode() == 200)
  }

  test("many flat macro calls in one query do NOT trip the recursion guard") {
    // round-4 advice: the depth guard used to count call-site
    // expansions, so ~10 independent calls were rejected as "recursive"
    assert(post("create macro inc1(x) as x + 1").statusCode() == 200)
    val calls = (1 to 15).map(i => s"inc1($i) AS c$i").mkString(", ")
    val r = post(s"SELECT $calls")
    assert(r.statusCode() == 200)
    val body = new String(r.body(), "UTF-8")
    assert(body.contains("\"c1\":2") && body.contains("\"c15\":16"))
    post("drop macro inc1")
  }

  test("named arguments bind by name, mix with positional, and reject unknowns") {
    assert(post("create macro padded(s, fill := '_', n := 5) as rpad(s, n, fill)")
      .statusCode() == 200)
    // named binding skips over `fill` to set `n`
    assert(new String(post("SELECT padded('ab', n := 4) AS p").body(), "UTF-8")
      == "[{\"p\":\"ab__\"}]")
    // named args may come in any order after positionals
    assert(new String(post("SELECT padded('ab', n := 4, fill := '*') AS p").body(), "UTF-8")
      == "[{\"p\":\"ab**\"}]")
    assert(post("SELECT padded('ab', bogus := 1) AS p").statusCode() == 400)
    assert(post("SELECT padded('ab', n := 3, n := 4) AS p").statusCode() == 400)
    assert(post("SELECT padded(n := 3, 'ab') AS p").statusCode() == 400) // positional after named
    assert(post("SELECT padded('ab', s := 'cd') AS p").statusCode() == 400) // bound twice
    post("drop macro padded")
  }

  test("FROM-first macro bodies are normalized at registration") {
    // DuckDB: CREATE MACRO t() AS TABLE FROM src SELECT col — the body
    // must be rewritten to SELECT-first before substitution
    assert(post("create macro ff() as table from fastpiv select g").statusCode() == 200)
    val r = post("SELECT * FROM ff() ORDER BY g")
    assert(r.statusCode() == 200)
    assert(new String(r.body(), "UTF-8") == "[{\"g\":\"a\"},{\"g\":\"b\"}]")
    post("drop macro ff")
  }

  test("overload sets: one CREATE MACRO with several signatures resolves by arity") {
    val c = post("create macro ovl(a) as a * 2, (a, b) as a + b, (a, b, c) as a + b + c")
    assert(c.statusCode() == 200)
    assert(new String(post("SELECT ovl(5) AS v").body(), "UTF-8") == "[{\"v\":10}]")
    assert(new String(post("SELECT ovl(5, 6) AS v").body(), "UTF-8") == "[{\"v\":11}]")
    assert(new String(post("SELECT ovl(1, 2, 3) AS v").body(), "UTF-8") == "[{\"v\":6}]")
    assert(post("SELECT ovl(1, 2, 3, 4) AS v").statusCode() == 400) // no 4-ary overload
    // duplicate arity in one overload set is rejected at CREATE
    assert(post("create macro dup(a) as a, (b) as b").statusCode() == 400)
    // a table-macro body's top-level commas do NOT split the overload set
    val t = post("create macro tsel() as table select 1 AS a, 2 AS b")
    assert(t.statusCode() == 200)
    assert(new String(post("SELECT * FROM tsel()").body(), "UTF-8") == "[{\"a\":1,\"b\":2}]")
    post("drop macro ovl"); post("drop macro tsel")
  }

  test("schema-qualified macro names: main.f registers, calls and drops") {
    assert(post("create macro main.sq(x) as x + 100").statusCode() == 200)
    assert(new String(post("SELECT sq(1) AS v").body(), "UTF-8") == "[{\"v\":101}]")
    assert(new String(post("SELECT main.sq(1) AS v").body(), "UTF-8") == "[{\"v\":101}]")
    // non-main schema fails loudly (no binary .db attach → only main exists)
    assert(post("create macro other.f(x) as x").statusCode() == 400)
    // t.sq stays member access — never expanded as a macro
    val r = post("SELECT t.sq FROM VALUES (7) t(sq)")
    assert(r.statusCode() == 200 && new String(r.body(), "UTF-8") == "[{\"sq\":7}]")
    assert(post("drop macro main.sq").statusCode() == 200)
    assert(post("SELECT sq(1) AS v").statusCode() == 400)
  }

  test("recursive macro fails loudly instead of looping") {
    assert(post("create macro loop_a() as loop_b()").statusCode() == 200)
    assert(post("create macro loop_b() as loop_a()").statusCode() == 200)
    val r = post("SELECT loop_a() AS x")
    assert(r.statusCode() == 400)
    assert(new String(r.body(), "UTF-8").contains("recursive"))
  }

  test("macro arity errors are 400s") {
    assert(post("create macro need2(a, b) as a + b").statusCode() == 200)
    assert(post("SELECT need2(1) AS x").statusCode() == 400)       // missing, no default
    assert(post("SELECT need2(1, 2, 3) AS x").statusCode() == 400) // too many
  }

  test("macro body paths hit the sandbox at use time") {
    val boxed = new QueryServer(session, 0, poolSize = 1,
      queryTimeoutMillis = 10000, allowedDirs = Seq("/root/testdata"))
    boxed.start()
    try {
      val b = s"http://localhost:${boxed.boundPort}"
      assert(post(s"create macro leak() as table select * from read_csv('$csvPath')", at = b)
        .statusCode() == 200) // creation stores the template — no read happens
      val r = post("select * from leak()", at = b)
      assert(r.statusCode() == 400)
      assert(new String(r.body(), "UTF-8").contains("outside allowed directories"))
    } finally boxed.stop()
  }

  test("PIVOT value enumeration runs under the 408 timeout and job group") {
    val t0 = System.nanoTime()
    val r = post("PIVOT slowpiv ON g USING sum(v)", at = baseOne)
    assert(r.statusCode() == 408)
    assert(new String(r.body(), "UTF-8").contains("\"title\":\"Query Timeout\""))
    // enumerate+cancel, not enumerate-to-completion (20 s sleep)
    assert((System.nanoTime() - t0) / 1e9 < 15.0)
  }

  test("PIVOT enumeration occupies a pool slot (admission control)") {
    // fair semaphore, poolSize=1: a PIVOT stuck enumerating must queue
    // the next query behind it until its 408 frees the slot
    val slow = new Thread(() => post("PIVOT slowpiv ON g USING sum(v)", at = baseOne))
    slow.start()
    Thread.sleep(500) // let the pivot take the slot
    val t0 = System.nanoTime()
    val quick = post("SELECT 1 AS one", at = baseOne)
    val waited = (System.nanoTime() - t0) / 1e9
    slow.join()
    assert(quick.statusCode() == 200)
    assert(waited >= 1.0, s"quick query should have queued behind the enumerating PIVOT, waited only ${waited}s")
  }

  test("PIVOT still works end-to-end through the moved enumeration path") {
    val r = post("PIVOT fastpiv ON g USING sum(v)", at = baseOne)
    assert(r.statusCode() == 200)
    assert(new String(r.body(), "UTF-8") == "[{\"a\":1,\"b\":2}]")
  }
}
