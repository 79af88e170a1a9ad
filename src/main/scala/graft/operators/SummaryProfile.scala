package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Registry-independent `Dataset.summary()` (round 15).
  *
  * Spark 4's `Dataset.summary` builds its stat columns through the
  * PUBLIC functions API, which resolves function NAMES through the
  * session registry — and the dialect shim registers DuckDB semantics
  * for some builtin names on served sessions (`element_at` over maps
  * is LIST-valued there, which is exactly what summary() uses to read
  * its internal stat map — every profiled value came back wrapped in
  * a one-element array, caught by the probe5 pin in the round-15 full
  * suite). This object rebuilds the same profile from RAW catalyst
  * aggregate expressions, so no name resolution can be intercepted:
  * the serving plane's SUMMARIZE verb and the library's i_summarize
  * row both route here.
  *
  * Semantics mirror Dataset.summary: numeric and string columns only;
  * count = non-null count; mean/stddev(samp)/percentiles (approx,
  * default 10000 accuracy) on numeric columns, null on strings;
  * min/max on both; every value rendered as its STRING cast; row
  * order = the requested stat order.
  */
object SummaryProfile {

  val AllStats: Seq[String] =
    Seq("count", "mean", "stddev", "min", "25%", "50%", "75%", "max")

  def of(df: DataFrame, stats: Seq[String] = AllStats): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.filter(f =>
      f.dataType.isInstanceOf[NumericType] || f.dataType == StringType)
    val outSchema = StructType(
      StructField("summary", StringType, nullable = false) +:
        fields.map(f => StructField(f.name, StringType, nullable = true)))
    if (fields.isEmpty)
      return spark.createDataFrame(
        java.util.List.of(stats.map(Row(_)): _*), outSchema)

    def pct(e: Expression, p: Double): AggregateFunction =
      new ApproximatePercentile(e, Literal(p),
        Literal(ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY))

    // one flat aggregate row: per column, the stat expressions that
    // apply; strings render as NULL for numeric-only stats
    val perCol: Seq[Seq[Option[AggregateFunction]]] = fields.toSeq.map { f =>
      val attr = ColumnBridge.expression(df.col(f.name))
      val num = f.dataType.isInstanceOf[NumericType]
      stats.map {
        case "count" => Some(Count(attr))
        case "mean" => if (num) Some(Average(attr)) else None
        case "stddev" => if (num) Some(StddevSamp(attr)) else None
        case "min" => Some(Min(attr))
        case "max" => Some(Max(attr))
        case "25%" => if (num) Some(pct(attr, 0.25)) else None
        case "50%" => if (num) Some(pct(attr, 0.5)) else None
        case "75%" => if (num) Some(pct(attr, 0.75)) else None
        case other => throw new IllegalArgumentException(
          s"summary: unknown statistic '$other'")
      }
    }
    val aggCols: Seq[Column] = perCol.flatten.flatten.map(e =>
      ColumnBridge.column(Cast(e.toAggregateExpression(), StringType)))
    val flat = df.groupBy().agg(aggCols.head, aggCols.tail: _*).collect()(0)

    // re-inflate the flat row into stats-per-column with NULL holes
    var k = -1
    val cells: Seq[Seq[String]] = perCol.map(_.map {
      case Some(_) => k += 1; flat.getString(k)
      case None => null
    })
    val rows = stats.indices.map(j =>
      Row.fromSeq(stats(j) +: fields.indices.map(i => cells(i)(j))))
    spark.createDataFrame(java.util.List.of(rows: _*), outSchema)
  }
}
