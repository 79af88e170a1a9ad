package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** CDC upsert / Bloom prefilter / Z-order layout operators. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("upsert merge: states partition the merged keyspace") {
    val rows = SparkEntry.queries("i_upsert_merge")(spark, sf).collect()
      .map(r => r.getAs[String]("state") -> r.getAs[Long]("n")).toMap
    val base = T(spark, sf, "orders")
    val nBase = base.count()
    val nUpd = base.filter(col("o_orderkey") % 7 === 0 &&
      !(col("o_orderkey") % 11 === 0)).count()
    val nDel = base.filter(col("o_orderkey") % 11 === 0).count()
    assert(rows.getOrElse("updated", 0L) == nUpd)
    assert(rows.getOrElse("deleted", 0L) == nDel)
    assert(rows.getOrElse("kept", 0L) == nBase - nUpd - nDel)
  }

  test("bloom prefilter: exact join scrubs false positives — ≡ plain semi-join") {
    val got = SparkEntry.queries("c_join_bloom_prefilter")(spark, sf).collect().head
    val dim = T(spark, sf, "customer")
      .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val expect = T(spark, sf, "orders")
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(got.getAs[Long]("n_orders") == expect)
  }

  test("equi-depth histogram: buckets are balanced and ordered") {
    val rows = SparkEntry.queries("d_equidepth_hist")(spark, sf).collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getAs[Long]("n"))
    // equi-depth: no bucket deviates more than 2% from the mean
    val mean = counts.sum.toDouble / counts.length
    counts.foreach(c => assert(math.abs(c - mean) <= mean * 0.02 + 1))
    // bucket value ranges must not overlap and must ascend
    val ordered = rows.sortBy(_.getAs[Int]("bucket"))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
  }

  test("attribution: revenue is conserved across channels") {
    val rows = SparkEntry.queries("j_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    val attributed = rows.map(_.getAs[Long]("n_purchases")).sum
    val purchases = T(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(attributed == purchases, "every purchase lands in exactly one channel")
  }

  test("binned range join ≡ direct nested-loop range join") {
    val got = SparkEntry.queries("c_join_range_binned")(spark, sf).collect().head
    val bands = T(spark, sf, "orders")
      .filter(col("o_orderkey") % 199 === 0)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice") / 500).as("lo"), (col("o_totalprice") / 500 + 40).as("hi"))
    val direct = T(spark, sf, "part")
      .join(bands, col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .count()
    assert(got.getAs[Long]("n_matches") == direct)
  }

  test("OHLC bars: high/low bound open and close") {
    val rows = SparkEntry.queries("j_ohlc_bars")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(h >= o - 0.005 && h >= c - 0.005 && l <= o + 0.005 && l <= c + 0.005)
      assert(r.getAs[Long]("n_ticks") >= 1)
    }
  }

  test("incremental rollup: merged daily partials equal the direct aggregation") {
    val merged = SparkEntry.queries("i_incremental_rollup")(spark, sf)
      .collect().map(_.toSeq).toSet
    val direct = T(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
      .groupBy(col("o_orderpriority").as("pri"),
        date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double"), 2).as("total"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .collect().map(_.toSeq).toSet
    assert(merged == direct, "partial-merge must be lossless for re-mergeable aggregates")
  }

  test("group sample: exactly 5 per group, stable across runs") {
    val a = SparkEntry.queries("i_group_sample")(spark, sf).collect().map(_.toSeq)
    val b = SparkEntry.queries("i_group_sample")(spark, sf).collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b))
    a.foreach(r => assert(r(1) == 5L))
  }

  test("z-order: every bucket is a tight 64x64 tile in (a,b) space") {
    val rows = SparkEntry.queries("i_zorder_layout")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_a") - r.getAs[Long]("min_a") <= 63L)
      assert(r.getAs[Long]("max_b") - r.getAs[Long]("min_b") <= 63L)
    }
    // linear-key bucketing (the non-Z layout) could never bound BOTH
    // ranges at once — that's the file-skipping win being asserted
  }
}
