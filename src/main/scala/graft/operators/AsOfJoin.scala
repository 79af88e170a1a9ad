package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join (reference surface: DuckDB `ASOF JOIN`, SURVEY.md §2.2 C):
  * for every left row, attach the right row with the greatest
  * `rightTime <= leftTime` within the same key group.
  *
  * Realization: union-tag + `last(_, ignoreNulls=true)` over a running
  * window — the classic distributed as-of — made SKEW-PROOF with
  * time-bucketed salting. A plain `partitionBy(key)` window puts a hot
  * key (one key holding 50% of events) on a single task, and AQE's
  * skew mitigation does NOT apply to `WindowExec` partitions (only to
  * sort-merge-join sides), so at 100 TB that is a straggler or an OOM.
  * Instead the window runs over `(key, time_bucket)`: the global time
  * range is split into `spark.graft.asof.buckets` (default 32)
  * equi-width buckets, so a hot key's rows spread across up to B
  * tasks. Cross-bucket state is restored with the same two-level
  * pattern as n_seq_packing's cumsum: one tiny row per (key, bucket)
  * carries the bucket's closing right-value, a per-key window over
  * that small relation (≤ B rows per key — bounded, skew-free) turns
  * closings into carry-ins, and each row's answer is
  * `coalesce(in-bucket running last, carry-in)`. Total cost: one
  * scalar min/max job, one shuffle+sort on (key, bucket), one
  * (key, bucket)-grain aggregate and an AQE-broadcastable join —
  * no per-row lookups, everything in Tungsten.
  */
object AsOfJoin {

  /** @param left        probe side; all its columns are kept
    * @param right       reference side
    * @param key         equi-join column name present on both sides
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param rightValues right columns to carry (renamed as given)
    * @param forward     false (default): greatest rightTime <= leftTime
    *                    (DuckDB `ON l.t >= r.t`); true: SMALLEST
    *                    rightTime >= leftTime (DuckDB `ON l.t <= r.t`) —
    *                    the mirror image: the window scans time
    *                    descending and carry-ins flow from LATER
    *                    buckets, everything else identical
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Map[String, String],
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val valueAliases = rightValues.values.toSeq
    val buckets =
      left.sparkSession.conf.get("spark.graft.asof.buckets", "32").toInt.max(1)

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

    val union = taggedLeft.unionByName(taggedRight)

    // Equi-width time buckets. Any (tmin, width) is CORRECT — rows
    // outside clamp into the edge buckets and the t → bucket map stays
    // monotone — the observed range just gives the best balance.
    // `spark.graft.asof.bucketWidth` (seconds) skips the range job
    // entirely (bucket = floor(t / width), unclamped) — the right
    // setting at 100 TB, where an extra scan of both inputs just to
    // learn min/max is real money; buckets=1 also skips it (classic
    // unsalted window: the constant bucket folds out of the partition
    // spec). Default: one scalar min/max job over the union.
    val widthConf =
      left.sparkSession.conf.get("spark.graft.asof.bucketWidth", "").trim
    // .cast("long") after floor: functions.floor resolves BY NAME
    // through the session registry, and a served session's DuckDB
    // dispatch types it DOUBLE — the bucket key must stay LONG-typed
    // regardless of which session runs this operator (round-13: the
    // skew spec caught the drift on an injected test session)
    val bucketCol =
      if (widthConf.nonEmpty)
        floor(col("__t").cast("double") / lit(widthConf.toDouble)).cast("long")
      else if (buckets <= 1) lit(0L)
      else {
        val range = union.agg(
          min(col("__t").cast("double")), max(col("__t").cast("double"))).head()
        val (tmin, tmax) =
          (if (range.isNullAt(0)) 0.0 else range.getDouble(0),
           if (range.isNullAt(1)) 0.0 else range.getDouble(1))
        val width = math.max((tmax - tmin) / buckets, 1e-9)
        least(greatest(
          floor((col("__t").cast("double") - lit(tmin)) / lit(width)).cast("long"),
          lit(0L)), lit(buckets - 1L))
      }
    val bucketed = union.withColumn("__b", bucketCol)

    // level 1: running last within each (key, bucket) — the hot key is
    // split across up to `buckets` tasks. Right rows (side=0) sort
    // before left rows at equal time → inclusive match, as DuckDB;
    // forward mode just scans time in the opposite direction.
    val tOrd = if (forward) col("__t").desc_nulls_last else col("__t").asc_nulls_last
    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(tOrd, col("__side").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueAliases.foldLeft(bucketed) { (df, a) =>
      df.withColumn(s"__loc_$a", last(col(s"__v_$a"), ignoreNulls = true).over(w))
    }

    // level 2: per-(key, bucket) closing right-value (left rows carry
    // null __v_* so the FILTER ignores them; every (key, bucket) in the
    // union gets a row, so left-only buckets still receive carry-ins),
    // then a per-key window over this ≤ buckets-rows-per-key relation
    // turns closings into the carry-in from all strictly earlier
    // buckets. Earlier bucket ⇒ strictly earlier time, so inclusive
    // semantics are untouched.
    val closeAgg = if (forward) "min_by" else "max_by"
    val closeCols = valueAliases.map { a =>
      expr(s"$closeAgg(`__v_$a`, `__t`) FILTER (WHERE `__v_$a` IS NOT NULL)")
        .as(s"__close_$a")
    }
    val closings = bucketed.groupBy(col("__k"), col("__b"))
      .agg(closeCols.head, closeCols.tail: _*)
    val bOrd = if (forward) col("__b").desc_nulls_first else col("__b").asc_nulls_first
    val cw = Window.partitionBy(col("__k")).orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = valueAliases.foldLeft(closings) { (df, a) =>
      df.withColumn(s"__carry_$a", last(col(s"__close_$a"), ignoreNulls = true).over(cw))
    }.select((Seq(col("__k"), col("__b")) ++
      valueAliases.map(a => col(s"__carry_$a"))): _*)

    // (key, bucket) join — salted like the window, AQE broadcasts the
    // small side; null-bucket rows (null left time) match nothing and
    // are nulled in the final projection anyway
    val filled = local.join(carries, Seq("__k", "__b"), "left")

    // a left row with a null timestamp matches nothing (it would sort
    // nulls-last and wrongly absorb the partition's latest right value)
    filled
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ valueAliases.map(a =>
        when(col(leftTime).isNotNull,
          coalesce(col(s"__loc_$a"), col(s"__carry_$a"))).otherwise(lit(null)).as(a))): _*)
  }
}
