package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() and every declared query runs. */
class EntrySpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship-style queries are non-empty") {
    val mustBeNonEmpty = Seq("q1_pricing_summary", "c_join_inner_5way",
      "n_dedup_exact", "n_cosine_topk_bruteforce", "n_text_stats",
      "j_sessionization", "c_join_asof", "m_binary_metadata")
    mustBeNonEmpty.foreach { name =>
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, s"$name is empty")
    }
  }

  test("seeded sample is deterministic across runs") {
    val a = SparkEntry.queries("i_sample_seeded")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("i_sample_seeded")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
