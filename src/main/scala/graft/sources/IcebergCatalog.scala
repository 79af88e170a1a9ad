package graft.sources

import org.apache.spark.sql.SparkSession

/** Iceberg REST catalog attach — the offline-realizable plumbing for
  * the reference's `ATTACH '<name>' AS iceberg (TYPE iceberg, ENDPOINT
  * …)` + `CREATE SECRET (TYPE iceberg, CLIENT_ID …, CLIENT_SECRET …)`
  * (uquery-rs src/cli/options.rs:175-181, init_script).
  *
  * On Spark the attach is catalog configuration: the PUBLIC
  * `spark.sql.catalog.<name>` keys of iceberg-spark-runtime. This
  * offline build ships no iceberg jar, so `attach` validates
  * availability and fails loudly with the deploy requirement; with
  * `iceberg-spark-runtime-3.5_2.13` (or the Spark-4 artifact) on the
  * classpath the same call goes live unchanged and
  * `SELECT * FROM <name>.<db>.<table>` just works.
  */
object IcebergCatalog {

  final case class Conf(
      name: String,
      endpoint: String,
      clientId: Option[String] = None,
      clientSecret: Option[String] = None,
      warehouse: Option[String] = None)

  /** The catalog conf the attach would install (exposed for specs and
    * for generating deploy-time configuration).
    */
  def catalogConf(c: Conf): Map[String, String] = {
    val base = Map(
      s"spark.sql.catalog.${c.name}" -> "org.apache.iceberg.spark.SparkCatalog",
      s"spark.sql.catalog.${c.name}.type" -> "rest",
      s"spark.sql.catalog.${c.name}.uri" -> c.endpoint)
    val cred = (c.clientId, c.clientSecret) match {
      // the REST catalog's OAuth2 client-credential flow — the
      // Spark-world shape of the reference's CLIENT_ID/CLIENT_SECRET
      case (Some(id), Some(secret)) =>
        Map(s"spark.sql.catalog.${c.name}.credential" -> s"$id:$secret")
      case _ => Map.empty[String, String]
    }
    val wh = c.warehouse.map(w => s"spark.sql.catalog.${c.name}.warehouse" -> w)
    base ++ cred ++ wh
  }

  def icebergAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: ClassNotFoundException => false }

  /** Install the catalog conf on the session, failing loudly when the
    * iceberg runtime is absent (this offline build).
    */
  def attach(spark: SparkSession, c: Conf): Unit = {
    if (!icebergAvailable) throw new IllegalStateException(
      "iceberg REST attach needs iceberg-spark-runtime on the classpath " +
        "(not shipped in this offline build) — see IcebergCatalog deploy note")
    catalogConf(c).foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
