package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11h graph-forensics semantics beyond the oracle gate: LPA
  * communities refine connected components, cohesion bookkeeping
  * closes, and the overlap matrix is complete and bounded.
  */
class Round11hSpec extends AnyFunSuite {
  import TestSpark._

  test("lpa: communities never cross edges' connected components, and refine them") {
    val rows = SparkEntry.queries("n_lpa_communities")(spark, sf).collect()
    assert(rows.nonEmpty)
    // labels propagate only along edges, so a community can never span
    // two components of the SAME graph — recompute components directly
    import org.apache.spark.sql.functions._
    val lpa = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find over the same >= 2-shared-digest edge relation
    val docs = T(spark, sf, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(1, size(filter(split(text, ' '), w -> length(w) > 0)) - 2),
           i -> CAST(conv(substring(md5(concat_ws(' ',
             element_at(filter(split(text, ' '), w -> length(w) > 0), i),
             element_at(filter(split(text, ' '), w -> length(w) > 0), i + 1),
             element_at(filter(split(text, ' '), w -> length(w) > 0), i + 2))), 1, 13), 16, 10) AS BIGINT)))""")
        .as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val edges = for {
      (a, ha) <- docs; (b, hb) <- docs if a < b && (ha & hb).size >= 2
    } yield (a, b)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val byComponent = lpa.keys.groupBy(find)
    // every LPA community sits inside ONE component
    lpa.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(find).toSet.size == 1,
        "an LPA community crossed a connected component")
    }
    // and LPA refines (>= as many communities as components)
    assert(lpa.values.toSet.size >= byComponent.size)
    // sizes column agrees with the actual community sizes
    val sizeOf = rows.groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.length }
    rows.foreach(r => assert(r.getLong(2) == sizeOf(r.getLong(1)).toLong))
  }

  test("cohesion: bookkeeping closes, pairs-as-edges clusters are cohesive") {
    val rows = SparkEntry.queries("n_cluster_cohesion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, e, poss, density) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(poss == n * (n - 1) / 2)
      assert(e >= n - 1, "a connected component needs >= n-1 internal edges")
      assert(e <= poss)
      assert(density > 0.0 && density <= 1.0)
      assert(r.getDouble(5) >= r.getDouble(6), "mean_j < min_j")
      assert(r.getDouble(6) >= 0.5, "edge below the verify threshold")
      if (n == 2) assert(r.getString(7) == "cohesive" && density == 1.0)
      val expect = if (n > 2 && density < 0.6) "chained" else "cohesive"
      assert(r.getString(7) == expect)
    }
  }

  test("source overlap matrix: complete, bounded, deterministic") {
    val rows = SparkEntry.queries("n_source_overlap_matrix")(spark, sf).collect()
    val sources = T(spark, sf, "documents").select("source").distinct().count()
    // complete unordered matrix (every pair shares at least one common
    // frequent trigram in this fixture)
    assert(rows.length == sources * (sources - 1) / 2,
      s"${rows.length} pairs for $sources sources")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not ordered sa < sb")
      val j = r.getDouble(3)
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 200)
      val expect = if (j >= 0.35) "redundant_pair" else "distinct"
      assert(r.getString(4) == expect)
    }
  }
}
