package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.{Failure, Success, Try}

/** Object-store (s3/gs) source plumbing — the offline-realizable half
  * of the reference's cloud credential surface (uquery-rs
  * src/cli/options.rs:151-201: `CREATE SECRET (TYPE GCS …)`, AWS/GCP
  * credential chains, httpfs LOAD).
  *
  * On Spark the equivalent of the reference's secrets is Hadoop
  * connector configuration: `configure` maps the same credential
  * inputs onto the PUBLIC hadoop-aws / gcs-connector config keys, and
  * `resolve` dispatches a URI by scheme to the right reader. This
  * container ships neither connector jar (zero egress), so activation
  * fails loudly with the exact deploy-time requirement instead of
  * failing opaquely inside a scan. Deploy note: add `hadoop-aws` +
  * `aws-java-sdk-bundle` (s3a) or `gcs-connector` (gs) to the
  * classpath and the same code paths go live unchanged.
  */
object ObjectStores {

  /** Credential surface mirroring the reference's CLI options
    * (src/cli/options.rs): static keys OR a provider/credential chain,
    * per store; endpoint override for S3-compatible stores (MinIO,
    * localstack — also how a local test endpoint stands in).
    */
  final case class Conf(
      s3KeyId: Option[String] = None,
      s3Secret: Option[String] = None,
      s3Endpoint: Option[String] = None,
      s3Region: Option[String] = None,
      awsCredentialChain: Boolean = false,
      gcsKeyId: Option[String] = None,
      gcsSecret: Option[String] = None,
      gcsCredentialChain: Boolean = false)

  /** Apply credentials to the session's Hadoop conf (the Spark-world
    * `CREATE SECRET`). Only sets keys for configured stores; never
    * logs secret material.
    */
  def configure(spark: SparkSession, conf: Conf): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    (conf.s3KeyId, conf.s3Secret) match {
      case (Some(k), Some(s)) =>
        hc.set("fs.s3a.access.key", k)
        hc.set("fs.s3a.secret.key", s)
        hc.set("fs.s3a.aws.credentials.provider",
          "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
      case _ if conf.awsCredentialChain =>
        // reference: UQ_CREATE_AWS_CREDENTIAL_CHAIN — env → profile →
        // instance metadata, the hadoop-aws default chain
        hc.set("fs.s3a.aws.credentials.provider",
          "com.amazonaws.auth.DefaultAWSCredentialsProviderChain")
      case _ =>
    }
    conf.s3Endpoint.foreach { e =>
      hc.set("fs.s3a.endpoint", e)
      // custom endpoints (MinIO/localstack/test servers) are
      // path-style; virtual-host style only works on real AWS
      hc.set("fs.s3a.path.style.access", "true")
    }
    conf.s3Region.foreach(hc.set("fs.s3a.endpoint.region", _))
    (conf.gcsKeyId, conf.gcsSecret) match {
      case (Some(k), Some(s)) =>
        hc.set("fs.gs.auth.type", "USER_CREDENTIALS")
        hc.set("fs.gs.auth.client.id", k)
        hc.set("fs.gs.auth.client.secret", s)
      case _ if conf.gcsCredentialChain =>
        // reference: UQ_CREATE_GCP_CREDENTIAL_CHAIN → application
        // default credentials
        hc.set("fs.gs.auth.type", "APPLICATION_DEFAULT")
      case _ =>
    }
  }

  /** Scheme a URI resolves through: `s3`/`s3a`/`s3n` → s3a, `gs` →
    * gs, `http(s)` → fetch-through-cache, everything else local.
    */
  def scheme(uri: String): String = {
    val c = uri.indexOf("://")
    if (c <= 0) "file"
    else uri.substring(0, c).toLowerCase match {
      case "s3" | "s3a" | "s3n" => "s3a"
      case "gs" => "gs"
      case "http" | "https" => "http"
      case other => other
    }
  }

  /** Normalize a store URI onto the Hadoop connector scheme
    * (`s3://b/k` → `s3a://b/k` — DuckDB-style s3 URLs read through
    * hadoop-aws's s3a filesystem).
    */
  def hadoopUri(uri: String): String = scheme(uri) match {
    case "s3a" => "s3a://" + uri.substring(uri.indexOf("://") + 3)
    case _ => uri
  }

  private def requireFilesystem(spark: SparkSession, fsScheme: String, jar: String): Unit = {
    val ok = Try(org.apache.hadoop.fs.FileSystem.getFileSystemClass(
      fsScheme, spark.sparkContext.hadoopConfiguration)) match {
      case Success(_) => true
      case Failure(_) => false
    }
    if (!ok) throw new IllegalStateException(
      s"scheme '$fsScheme' needs the $jar connector on the classpath " +
        "(not shipped in this offline build) — see ObjectStores deploy note")
  }

  /** Resolve a URI to a readable location, enforcing the reference's
    * `enable_external_access` semantics: when the server runs
    * sandboxed, remote schemes must be explicitly allowed.
    */
  def resolve(spark: SparkSession, uri: String, remoteAllowed: Boolean = true): String =
    scheme(uri) match {
      case "file" => uri
      case _ if !remoteAllowed =>
        throw new IllegalArgumentException(
          s"remote access disabled by sandbox (external access off): $uri")
      case "s3a" =>
        requireFilesystem(spark, "s3a", "hadoop-aws + aws-java-sdk-bundle")
        hadoopUri(uri)
      case "gs" =>
        requireFilesystem(spark, "gs", "gcs-connector")
        uri
      case "http" => HttpFiles.fetch(uri)
      case other =>
        requireFilesystem(spark, other, s"a '$other' Hadoop filesystem")
        uri
    }

  def parquet(spark: SparkSession, uri: String, remoteAllowed: Boolean = true): DataFrame =
    spark.read.parquet(resolve(spark, uri, remoteAllowed))

  def csv(spark: SparkSession, uri: String, remoteAllowed: Boolean = true): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(resolve(spark, uri, remoteAllowed))

  def json(spark: SparkSession, uri: String, remoteAllowed: Boolean = true): DataFrame =
    spark.read.json(resolve(spark, uri, remoteAllowed))
}
