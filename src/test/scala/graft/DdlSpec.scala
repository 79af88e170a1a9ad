package graft

import graft.server.QueryServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Session DDL/DML over HTTP: the reference's embedded DuckDB accepts
  * CREATE TABLE/VIEW, INSERT, DELETE, UPDATE and DROP against its
  * in-memory default database; ours realizes them as session temp
  * views (CTAS/mutations materialized via localCheckpoint, views
  * lazy). Result shapes mirror DuckDB: mutating verbs return one
  * `Count` row, schema/view/drop verbs return empty.
  */
class DdlSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private var srv: QueryServer = _
  private var base: String = _
  private val client = HttpClient.newHttpClient()

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

  private def ok(sql: String, expect: String): Unit = {
    val r = post(sql)
    assert(r.statusCode() == 200, s"$sql -> ${r.body()}")
    assert(r.body() == expect, s"$sql -> ${r.body()} (wanted $expect)")
  }

  test("CTAS returns Count, the table persists across requests, and CTAS is materialized") {
    ok("CREATE TABLE ddl_t1 AS SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 3",
      """[{"Count":3}]""")
    ok("SELECT count(*) AS n FROM ddl_t1", """[{"n":3}]""")
    // plain CREATE on an existing name errors, like DuckDB
    assert(post("CREATE TABLE ddl_t1 AS SELECT 1").statusCode() >= 400)
    ok("CREATE OR REPLACE TABLE ddl_t1 AS SELECT 10 AS a", """[{"Count":1}]""")
    ok("SELECT a FROM ddl_t1", """[{"a":10}]""")
    // materialization proof: a CTAS over uuid() must not re-evaluate
    ok("CREATE OR REPLACE TABLE ddl_mat AS SELECT uuid() AS u", """[{"Count":1}]""")
    val a = post("SELECT u FROM ddl_mat").body()
    val b = post("SELECT u FROM ddl_mat").body()
    assert(a == b, s"CTAS not materialized: $a vs $b")
  }

  test("typed CREATE TABLE + INSERT/DELETE/UPDATE with DuckDB Count results") {
    ok("CREATE OR REPLACE TABLE ddl_t3 (a INTEGER, b VARCHAR)", "[]")
    ok("INSERT INTO ddl_t3 VALUES (1, 'x'), (2, 'y'), (3, 'z')", """[{"Count":3}]""")
    ok("INSERT INTO ddl_t3 SELECT 4, 'w'", """[{"Count":1}]""")
    ok("SELECT count(*) AS n FROM ddl_t3", """[{"n":4}]""")
    // named-column insert fills the rest with NULL
    ok("INSERT INTO ddl_t3 (a) VALUES (9)", """[{"Count":1}]""")
    ok("SELECT b FROM ddl_t3 WHERE a = 9", """[{"b":null}]""")
    ok("DELETE FROM ddl_t3 WHERE a >= 3", """[{"Count":3}]""")
    ok("SELECT count(*) AS n FROM ddl_t3", """[{"n":2}]""")
    ok("UPDATE ddl_t3 SET b = 'q' WHERE a = 2", """[{"Count":1}]""")
    ok("SELECT b FROM ddl_t3 WHERE a = 2", """[{"b":"q"}]""")
    // arity mismatch and unknown column are loud
    assert(post("INSERT INTO ddl_t3 VALUES (1)").statusCode() >= 400)
    assert(post("UPDATE ddl_t3 SET zz = 1").statusCode() >= 400)
    // constraints are refused loudly, never silently ignored
    assert(post("CREATE OR REPLACE TABLE ddl_c (a INTEGER PRIMARY KEY)").statusCode() >= 400)
  }

  test("views stay lazy, DROP works, missing names are loud") {
    ok("CREATE OR REPLACE TABLE ddl_base AS SELECT 1 AS v", """[{"Count":1}]""")
    ok("CREATE OR REPLACE VIEW ddl_v AS SELECT v * 2 AS w FROM ddl_base", "[]")
    ok("SELECT w FROM ddl_v", """[{"w":2}]""")
    // the view tracks its base table — lazy, like a DuckDB view
    ok("CREATE OR REPLACE TABLE ddl_base AS SELECT 5 AS v", """[{"Count":1}]""")
    ok("SELECT w FROM ddl_v", """[{"w":10}]""")
    ok("DROP VIEW ddl_v", "[]")
    assert(post("SELECT * FROM ddl_v").statusCode() >= 400)
    assert(post("DROP TABLE ddl_nope").statusCode() >= 400)
    ok("DROP TABLE IF EXISTS ddl_nope", "[]")
    ok("DROP TABLE ddl_base", "[]")
  }

  test("DuckDB-dialect SQL flows through DDL verbs (brackets, macros, sandbox)") {
    // the CTAS inner query goes through the full rewrite pipeline
    ok("CREATE OR REPLACE TABLE ddl_dk AS SELECT [1, 2, 3][2] AS x", """[{"Count":1}]""")
    ok("SELECT x FROM ddl_dk", """[{"x":2}]""")
    // DELETE predicates get the dialect treatment too (1-based bracket)
    ok("CREATE OR REPLACE TABLE ddl_lst AS SELECT 1 AS id UNION ALL SELECT 2", """[{"Count":2}]""")
    ok("DELETE FROM ddl_lst WHERE id = [1, 2][1]", """[{"Count":1}]""")
    ok("SELECT id FROM ddl_lst", """[{"id":2}]""")
    ok("DROP TABLE ddl_dk", "[]")
    ok("DROP TABLE ddl_lst", "[]")
    ok("DROP TABLE IF EXISTS ddl_t1", "[]")
    ok("DROP TABLE IF EXISTS ddl_t3", "[]")
    ok("DROP TABLE IF EXISTS ddl_mat", "[]")
  }

  test("named-column INSERT validates names case-insensitively, unknown/duplicate are loud") {
    ok("CREATE OR REPLACE TABLE ddl_nc (a INTEGER, b VARCHAR)", "[]")
    // case-insensitive resolution, like DuckDB identifiers
    ok("INSERT INTO ddl_nc (B, A) VALUES ('x', 1)", """[{"Count":1}]""")
    ok("SELECT a, b FROM ddl_nc", """[{"a":1,"b":"x"}]""")
    // unknown column: DuckDB binder error, never a silent all-NULL row
    assert(post("INSERT INTO ddl_nc (bogus) VALUES (9)").statusCode() >= 400)
    assert(post("INSERT INTO ddl_nc (a, zz) VALUES (1, 2)").statusCode() >= 400)
    assert(post("INSERT INTO ddl_nc (a, A) VALUES (1, 2)").statusCode() >= 400)
    ok("SELECT count(*) AS n FROM ddl_nc", """[{"n":1}]""") // nothing leaked in
    ok("DROP TABLE ddl_nc", "[]")
  }

  test("replaced materializations release their blocks (no storage accumulation)") {
    def persistedBlocks(): Int =
      spark.sparkContext.getPersistentRDDs.size
    ok("CREATE OR REPLACE TABLE ddl_acc AS SELECT 0 AS v", """[{"Count":1}]""")
    val after1 = persistedBlocks()
    // a hot mutation loop: each INSERT/UPDATE re-materializes the
    // table; the replaced checkpoint must be unpersisted immediately,
    // not left to driver GC (round-8 verdict #4)
    (1 to 10).foreach { i =>
      ok(s"INSERT INTO ddl_acc VALUES ($i)", """[{"Count":1}]""")
      ok(s"UPDATE ddl_acc SET v = v WHERE v = $i", """[{"Count":1}]""")
    }
    val afterN = persistedBlocks()
    assert(afterN <= after1,
      s"storage accumulated across mutations: $after1 -> $afterN persistent RDDs")
    ok("DROP TABLE ddl_acc", "[]")
    assert(persistedBlocks() < after1, "DROP did not release the materialization")
  }

  test("concurrent mutations on one table serialize (no lost updates)") {
    ok("CREATE OR REPLACE TABLE ddl_cc (v INTEGER)", "[]")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 12).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          override def call(): Int = post(s"INSERT INTO ddl_cc VALUES ($i)").statusCode()
        })
      }
      assert(futures.map(_.get()).forall(_ == 200))
    } finally pool.shutdown()
    // without the per-session DDL lock, concurrent read-modify-write
    // materializations silently drop rows (round-9 advice)
    ok("SELECT count(*) AS n FROM ddl_cc", """[{"n":12}]""")
    ok("DROP TABLE ddl_cc", "[]")
  }
}
