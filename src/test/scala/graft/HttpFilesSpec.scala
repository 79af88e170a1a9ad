package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.HttpFiles
import java.net.InetSocketAddress
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Remote-file source resolved through a local HTTP server
  * (zero-egress stand-in for `FROM 'https://...'`).
  */
class HttpFilesSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private val csvBody = "f_str,f_int,f_float\nabc,123,4.56\ndef,789,10.12\n"
  private var fileServer: HttpServer = _
  private var url: String = _
  @volatile private var hits = 0

  override def beforeAll(): Unit = {
    fileServer = HttpServer.create(new InetSocketAddress(0), 0)
    fileServer.createContext("/test.csv", (x: HttpExchange) => {
      hits += 1
      val b = csvBody.getBytes("UTF-8")
      x.sendResponseHeaders(200, b.length.toLong)
      x.getResponseBody.write(b)
      x.close()
    })
    fileServer.start()
    url = s"http://localhost:${fileServer.getAddress.getPort}/test.csv"
  }

  override def afterAll(): Unit = if (fileServer != null) fileServer.stop(0)

  test("csv over http: header + inference, reference-fixture shape") {
    val df = HttpFiles.csv(spark, url)
    assert(df.columns.toSeq == Seq("f_str", "f_int", "f_float"))
    val rows = df.orderBy("f_int").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "abc" && rows(0).getInt(1) == 123)
    assert(math.abs(rows(1).getDouble(2) - 10.12) < 1e-9)
  }

  test("second read hits the cache, not the network") {
    val before = hits
    HttpFiles.csv(spark, url).count()
    assert(hits == before, "cache miss: refetched an already-cached URL")
  }
}
