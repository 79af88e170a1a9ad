package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join (reference surface: DuckDB `ASOF JOIN`, SURVEY.md §2.2 C):
  * for every left row, attach the right row with the greatest
  * `rightTime <= leftTime` within the same key group.
  *
  * Realization: union-tag + `last(_, ignoreNulls=true)` over a
  * running window — the classic distributed as-of. Both inputs are
  * tagged, unioned, and windowed with
  * `partitionBy(key).orderBy(time, side)` where right rows sort before
  * left rows at equal timestamps (inclusive `>=` semantics, matching
  * DuckDB). One shuffle on the key + one in-partition sort, no
  * broadcast, no per-row lookups: at 100 TB this is a single
  * sort-merge pass, and skewed keys are handled by AQE. (A
  * `SparkStrategy` with a zipPartitions merge would save the union
  * materialization; the window form stays entirely in Tungsten and
  * has been fast enough — revisit only if profiling says so.)
  */
object AsOfJoin {

  /** @param left        probe side; all its columns are kept
    * @param right       reference side
    * @param key         equi-join column name present on both sides
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param rightValues right columns to carry (renamed as given)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val valueAliases = rightValues.values.toSeq

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        (Seq(col("__t"), col("__side"), col(key).as("__k")) ++
          leftCols.map(col) ++
          valueAliases.map(a => lit(null).as(s"__v_$a"))): _*)

    // null right timestamps can never satisfy rightTime <= leftTime
    // (SQL three-valued comparison), so they must not enter the window
    val taggedRight = right
      .filter(col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (Seq(col("__t"), col("__side"), col(key).as("__k")) ++
          leftCols.map(c => lit(null).as(c)) ++
          rightValues.toSeq.map { case (src, a) => col(src).as(s"__v_$a") }): _*)

    // right rows (side=0) sort before left rows at equal time → inclusive match
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc_nulls_last, col("__side").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = valueAliases.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, a) => df.withColumn(a, last(col(s"__v_$a"), ignoreNulls = true).over(w))
    }

    // a left row with a null timestamp matches nothing (it would sort
    // nulls-last and wrongly absorb the partition's latest right value)
    filled
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ valueAliases.map(a =>
        when(col(leftTime).isNotNull, col(a)).otherwise(lit(null)).as(a))): _*)
  }
}
