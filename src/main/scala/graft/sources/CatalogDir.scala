package graft.sources

import org.apache.spark.sql.SparkSession

/** Attached-database analog.
  *
  * The reference ATTACHes a read-only DuckDB file at startup and `USE`s
  * it on every pooled connection (uquery-rs src/cli/options.rs:183-187,
  * src/core/duckdb.rs:19-22); its tests query a `language` table and a
  * `test()` table macro shipped inside tests/test.db. Spark has no .db
  * reader, so the equivalent catalog bootstrap is a DIRECTORY:
  *
  *   - every `<name>.parquet` under the dir becomes temp view `<name>`
  *     (the attached tables),
  *   - an optional `init.sql` runs statement-by-statement (split on
  *     top-level `;`), carrying the view/macro surface — e.g.
  *     `CREATE TEMPORARY VIEW ...` (table macro) and
  *     `CREATE TEMPORARY FUNCTION ... RETURN ...` (scalar macro,
  *     Spark ≥4 SQL UDFs).
  *
  * Read-only posture matches the reference: only session-scoped
  * catalog objects are created; nothing on disk is written.
  */
object CatalogDir {

  /** Registers the directory's tables and init statements; returns the
    * registered view names (parquet-backed ones only).
    */
  def attach(spark: SparkSession, dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"not a directory: $dir")
    val tables = d.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .map { f =>
        val name = f.getName.stripSuffix(".parquet")
        spark.read.parquet(f.getAbsolutePath).createOrReplaceTempView(name)
        name
      }.toSeq
    val init = new java.io.File(d, "init.sql")
    if (init.isFile) {
      val sql = java.nio.file.Files.readString(init.toPath)
      // through the dialect shim: the reference's init scripts are
      // DuckDB SQL (`create macro nytemp() as table …`,
      // custom-database.md:28) — macro verbs register in the session's
      // macro registry, Spark-native DDL passes through untouched
      splitStatements(sql).foreach(stmt =>
        spark.sql(graft.server.Dialect.rewrite(spark, stmt)))
    }
    tables
  }

  /** Split on `;` outside quotes — enough for view/function DDL. */
  private[graft] def splitStatements(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var q: Char = 0
    sql.foreach { c =>
      if (q == 0 && (c == '\'' || c == '"' || c == '`')) q = c
      else if (q != 0 && c == q) q = 0
      if (q == 0 && c == ';') { out += cur.toString; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }
}
