package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the TPC-H q2–q22 conformance battery
  * (queries/TpchQueries.scala) — value-level correctness is the
  * driver's DuckDB hash compare; these pin the cross-query
  * relationships a hash compare can't see.
  */
class TpchSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf).collect()

  test("q13 custdist sums to the customer count (outer join loses nobody)") {
    val custdist = run("tpch_q13").map(_.getLong(1)).sum
    val customers = T(spark, sf, "customer").count()
    assert(custdist == customers, s"$custdist != $customers")
  }

  test("q15 top supplier carries the max revenue of the revenue view") {
    val rows = run("tpch_q15")
    if (rows.nonEmpty) {
      val top = rows.map(_.getDouble(2)).max
      assert(rows.forall(_.getDouble(2) == top))
    }
  }

  test("q2 min-cost correlation: every surviving row IS its part's minimum cost") {
    val rows = run("tpch_q02")
    // (p_partkey -> ps_supplycost) pairs must be unique per part value
    val byPart = rows.groupBy(_.getLong(3)).view.mapValues(_.map(_.getDouble(5)).distinct)
    assert(byPart.values.forall(_.size == 1))
  }

  test("q4 order counts are bounded by the unfiltered quarter counts") {
    import org.apache.spark.sql.functions._
    val counted = run("tpch_q04").map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = T(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .groupBy(col("o_orderpriority")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counted.foreach { case (k, v) => assert(v <= all.getOrElse(k, 0L)) }
  }

  test("q18 every returned order really exceeds the quantity threshold") {
    import org.apache.spark.sql.functions._
    val keys = run("tpch_q18").map(_.getLong(2)).toSet
    if (keys.nonEmpty) {
      val sums = T(spark, sf, "lineitem")
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
        .filter(col("l_orderkey").isin(keys.toSeq: _*)).collect()
      assert(sums.forall(_.getDouble(1) > 300.0))
    }
  }

  test("q21 numwait totals never exceed the filtered lineitem count") {
    val total = run("tpch_q21").map(_.getLong(1)).sum
    val bound = T(spark, sf, "lineitem").count()
    assert(total <= bound)
  }
}
