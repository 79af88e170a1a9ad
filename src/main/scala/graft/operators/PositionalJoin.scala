package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** POSITIONAL JOIN (DuckDB: zip two relations by row order,
  * SURVEY.md §2.2 C). Row order is only meaningful once the caller
  * fixes it, so this takes already-sorted inputs and zips with
  * `RDD.zipWithIndex` — a distributed global index that preserves the
  * sort's range-partitioned order without collapsing to one partition
  * (the `row_number() OVER ()` single-partition trap). Shorter side
  * pads with nulls via full-outer on the index, matching DuckDB.
  */
object PositionalJoin {

  private def withPos(df: DataFrame, posName: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField(posName, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  def apply(left: DataFrame, right: DataFrame): DataFrame = {
    val l = withPos(left, "__lpos")
    val r = withPos(right, "__rpos")
    l.join(r, l("__lpos") === r("__rpos"), "full_outer")
      .withColumn("pos", coalesce(col("__lpos"), col("__rpos")))
      .drop("__lpos", "__rpos")
  }
}
