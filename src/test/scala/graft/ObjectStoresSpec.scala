package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.ObjectStores
import java.net.InetSocketAddress
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Object-store resolver plumbing (s3/gs credential + scheme
  * dispatch), spec'd offline: credentials land on the public Hadoop
  * connector keys, scheme routing is exact, the missing connector jar
  * fails LOUDLY with the deploy requirement, and the http path reads
  * end-to-end through a local endpoint standing in for a remote store.
  */
class ObjectStoresSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private val csvBody = "k,v\na,1\nb,2\n"
  private var fileServer: HttpServer = _
  private var url: String = _

  override def beforeAll(): Unit = {
    fileServer = HttpServer.create(new InetSocketAddress(0), 0)
    fileServer.createContext("/bucket/data.csv", (x: HttpExchange) => {
      val b = csvBody.getBytes("UTF-8")
      x.sendResponseHeaders(200, b.length.toLong)
      x.getResponseBody.write(b)
      x.close()
    })
    fileServer.start()
    url = s"http://localhost:${fileServer.getAddress.getPort}/bucket/data.csv"
  }

  override def afterAll(): Unit = if (fileServer != null) fileServer.stop(0)

  test("configure maps static S3 keys + endpoint onto hadoop-aws conf") {
    ObjectStores.configure(spark, ObjectStores.Conf(
      s3KeyId = Some("AKID"), s3Secret = Some("SECRET"),
      s3Endpoint = Some("http://localhost:9000"), s3Region = Some("us-east-1")))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") == "AKID")
    assert(hc.get("fs.s3a.secret.key") == "SECRET")
    assert(hc.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(hc.get("fs.s3a.endpoint.region") == "us-east-1")
    assert(hc.get("fs.s3a.path.style.access") == "true")
    assert(hc.get("fs.s3a.aws.credentials.provider").contains("SimpleAWSCredentialsProvider"))
  }

  test("configure maps the GCS credential chain like the reference's init script") {
    ObjectStores.configure(spark, ObjectStores.Conf(gcsCredentialChain = true))
    assert(spark.sparkContext.hadoopConfiguration.get("fs.gs.auth.type") == "APPLICATION_DEFAULT")
  }

  test("scheme dispatch: s3-family normalizes to s3a, gs/http/file pass through") {
    assert(ObjectStores.scheme("s3://b/k.parquet") == "s3a")
    assert(ObjectStores.scheme("s3a://b/k.parquet") == "s3a")
    assert(ObjectStores.scheme("gs://b/k.parquet") == "gs")
    assert(ObjectStores.scheme("https://h/p.csv") == "http")
    assert(ObjectStores.scheme("/local/p.csv") == "file")
    assert(ObjectStores.hadoopUri("s3://b/k.parquet") == "s3a://b/k.parquet")
  }

  test("missing connector jar fails loudly with the deploy requirement") {
    val e = intercept[IllegalStateException] {
      ObjectStores.resolve(spark, "s3://bucket/key.parquet")
    }
    assert(e.getMessage.contains("hadoop-aws"))
    val g = intercept[IllegalStateException] {
      ObjectStores.resolve(spark, "gs://bucket/key.parquet")
    }
    assert(g.getMessage.contains("gcs-connector"))
  }

  test("sandbox: remote schemes are rejected when external access is off") {
    val e = intercept[IllegalArgumentException] {
      ObjectStores.resolve(spark, "s3://bucket/key.parquet", remoteAllowed = false)
    }
    assert(e.getMessage.contains("remote access disabled"))
    // local paths stay allowed (the directory sandbox governs those)
    assert(ObjectStores.resolve(spark, "/x/y.csv", remoteAllowed = false) == "/x/y.csv")
  }

  test("http endpoint stands in for a remote store end-to-end") {
    val df = ObjectStores.csv(spark, url)
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.count() == 2)
  }

  test("iceberg REST attach: conf shape is exact, absent jar fails loudly") {
    import graft.sources.IcebergCatalog
    val conf = IcebergCatalog.catalogConf(IcebergCatalog.Conf(
      name = "lake", endpoint = "http://localhost:8181",
      clientId = Some("u"), clientSecret = Some("s")))
    assert(conf("spark.sql.catalog.lake") == "org.apache.iceberg.spark.SparkCatalog")
    assert(conf("spark.sql.catalog.lake.type") == "rest")
    assert(conf("spark.sql.catalog.lake.uri") == "http://localhost:8181")
    assert(conf("spark.sql.catalog.lake.credential") == "u:s")
    assert(!IcebergCatalog.icebergAvailable) // offline build ships no jar
    val e = intercept[IllegalStateException] {
      IcebergCatalog.attach(spark, IcebergCatalog.Conf("lake", "http://localhost:8181"))
    }
    assert(e.getMessage.contains("iceberg-spark-runtime"))
  }
}
