package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory of the reference (fb64/uquery-rs = a SQL
  * façade over embedded DuckDB 1.5.2; SURVEY.md §2) is realized here as
  * named Spark query programs, each paired with ANSI oracle SQL that
  * the driver cross-checks in DuckDB on the same parquet tables.
  */
object SparkEntry {

  /** All query modules, in SURVEY §7 build order. */
  def modules: Seq[QueryModule] = Seq(
    CoreQueries, JoinQueries, SortSetQueries, AggQueries, WindowQueries,
    ScalarQueries, TableFnQueries, AdvancedQueries,
    TextQueries, DedupQueries, SimilarityQueries, MultimodalQueries,
    FileFormatQueries, ExtraQueries, ScaleQueries, Round2Queries,
    Round3Queries, PipelineQueries, EventAnalyticsQueries, LayoutQueries,
    Round6Queries, Round8Queries, Round9Queries, Round9bQueries,
    Round10Queries, Round11Queries, Round11bQueries, Round11cQueries,
    Round11dQueries, Round11eQueries, Round11gQueries, Round11hQueries, Round11iQueries,
    Round12Queries, Round12bQueries, Round12cQueries, TpchQueries,
    Round14Queries, Round15Queries)

  private lazy val allQueries: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1(GraftSession.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> { (s: SparkSession, dir: String) =>
      q.fn(GraftSession.tune(s), dir)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
