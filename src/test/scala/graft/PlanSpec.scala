package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape assertions: the plans we ship are the plans we mean.
  * Filters reach the parquet scan, projections prune columns, small
  * dims broadcast, hot paths stay inside whole-stage codegen, and
  * top-k never global-sorts. These are the properties that decide
  * whether a query survives a 100×–1000× scale-up.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("q1: filter pushed to parquet scan + column pruning + WSCG") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    // AQE final plans render codegen stages as "*(n)" prefixes
    assert(p.contains("*("), "no whole-stage-codegen span")
    // pruned read schema: no partkey/suppkey in the scan
    assert(!p.contains("l_partkey"), "scan reads unused columns")
  }

  test("5-way join: dimensions broadcast, no shuffle for dims") {
    val p = planOf("c_join_inner_5way")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = planOf("f_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("semi/anti joins plan as semi/anti, not materialized subqueries") {
    assert(planOf("c_join_semi").contains("LeftSemi"))
    assert(planOf("c_join_anti").contains("LeftAnti"))
  }

  test("partitioned scan prunes partitions at plan time") {
    val p = planOf("a_partitioned_glob_scan")
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus"), p)
  }

  test("bucketed join scans matching buckets without pre-join shuffle") {
    val p = planOf("c_join_bucketed")
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("SelectedBucketsCount"), "scan not bucketed:\n" + p)
  }

  test("windows partition by key (no single-partition global window)") {
    val p = SparkEntry.queries("e_rank_family")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(!p.contains("Window [row_number()], []"),
      "window with empty partition spec would serialize on one task")
  }

  test("quantile sketch bottom-k plans as TakeOrderedAndProject (round 11)") {
    val p = planOf("n_quantile_sketch")
    assert(p.contains("TakeOrderedAndProject"),
      "the bottom-k sample must be a per-partition top-k, not a sort:\n" + p)
  }

  test("bloom screen probes the filter via a broadcast join (round 11)") {
    val p = planOf("n_dedup_bloom_screen")
    assert(p.contains("BroadcastHashJoin"),
      "the 4096-lane filter must broadcast to the probe side:\n" + p)
  }

  test("equi-depth histogram stays in the DataFrame plan — no RDD detour (round 11)") {
    val p = planOf("d_equidepth_hist")
    assert(!p.contains("Scan ExistingRDD"),
      "an RDD scan means zipWithIndex came back:\n" + p)
    assert(p.contains("TakeOrderedAndProject") || p.contains("Window"),
      "expected the two-level rank machinery:\n" + p)
  }
}
