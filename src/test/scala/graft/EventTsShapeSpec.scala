package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression spec for the round-7 outage: the driver regenerated the
  * fixtures and events.ts flipped from parquet TIMESTAMP(NANOS) (read
  * as long under nanosAsLong) to TIMESTAMP(µs) unadjusted (read as
  * TIMESTAMP_NTZ). The loader's unconditional ns→µs conversion then
  * failed analysis, killing every events-table query and the entire
  * bench run. T.normalizeEventTs must accept every shape the column
  * has ever shipped in and always yield session-local TimestampType
  * with identical instants.
  */
class EventTsShapeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 2024-01-01T00:00:00.123456 UTC, as µs since epoch
  private val baseUs = 1704067200L * 1000000L + 123456L

  test("long nanos shape floors to µs and becomes TimestampType") {
    val df = Seq((1L, baseUs * 1000L + 789L)).toDF("event_id", "ts") // +789 ns
    val out = T.normalizeEventTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == baseUs)
  }

  test("TIMESTAMP_NTZ shape casts value-identically under UTC session") {
    val df = Seq((1L, baseUs)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = T.normalizeEventTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == baseUs)
  }

  test("already-LTZ shape passes through untouched") {
    val df = Seq((1L, baseUs)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val out = T.normalizeEventTs(df)
    assert(out eq df) // no projection added
    assert(out.schema("ts").dataType == TimestampType)
  }

  test("each shape round-trips through parquet to the same instants") {
    // Write the NTZ and LTZ shapes to disk and load through the same
    // reader path T uses; both must agree with the long-ns shape.
    val dir = Files.createTempDirectory("evts").toString
    val rows = Seq((1L, baseUs), (2L, baseUs + 3600L * 1000000L))
    rows.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz.parquet")
    rows.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ltz.parquet")
    val expected = rows.map(_._2)
    for (shape <- Seq("ntz", "ltz")) {
      val out = T.normalizeEventTs(spark.read.parquet(s"$dir/$shape.parquet"))
      assert(out.schema("ts").dataType == TimestampType, shape)
      assert(out.orderBy("event_id").select(unix_micros(col("ts")))
        .as[Long].collect().toSeq == expected, shape)
    }
  }

  test("the fixture events table loads as TimestampType and queries analyze") {
    val ev = T(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    // the exact operation that broke in round 7: instant arithmetic on ts
    assert(ev.select(unix_micros(col("ts"))).limit(1).count() == 1L)
  }
}
