package graft

import graft.queries.Round8Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-data proofs for the round-8 operators. */
class Round8Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("dup-span extraction finds exactly the planted shared substring, merged maximal") {
    // docs 1 and 2 share tokens 3..10 (an 8-token run = four overlapping
    // duplicated 5-grams in each doc → ONE merged island, not four rows);
    // doc 3 shares nothing. Unique filler tokens guarantee no other gram
    // repeats across docs.
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 b1 c1 $shared x1 y1", "en"),
      (2L, s"a2 b2 c2 $shared x2 y2", "en"),
      (3L, "a3 b3 c3 d3 e3 f3 g3 h3 i3 j3 k3 l3 m3", "en")
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Round8Queries.queries.find(_.name == "n_dup_span_extract").get
      .fn(spark, dir)
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_grams")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // tokens 0..2 are unique prefixes, shared run occupies 3..10; the
    // duplicated 5-gram starts are 3..6 (4 grams), island = [3, 10]
    assert(out == Seq((1L, 3L, 10L, 8L, 4L), (2L, 3L, 10L, 8L, 4L)))
  }

  test("span apply keeps the owner's copy and cuts every other occurrence") {
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val whole = (1 to 6).map(i => s"eq$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 b1 c1 $shared x1 y1", "en"), // owner of the shared run
      (2L, s"a2 b2 c2 $shared x2 y2", "en"), // loses tokens 3..10
      (3L, "a3 b3 c3 d3 e3 f3 g3 h3 i3 j3 k3 l3 m3", "en"), // untouched
      (4L, whole, "en"), // owner of the whole-doc duplicate
      (5L, whole, "en")  // fully cut: subsumes exact dedup
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("spanapply").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Round8Queries.queries.find(_.name == "n_dup_span_apply").get
      .fn(spark, dir)
      .select("doc_id", "n_tok_before", "n_tok_after", "n_spans_cut")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 13L, 13L, 0L), // owner: nothing cut
      (2L, 13L, 5L, 1L),  // 8 shared tokens cut as ONE span
      (3L, 13L, 13L, 0L),
      (4L, 6L, 6L, 0L),
      (5L, 6L, 0L, 1L)    // byte-identical doc fully removed
    ))
    // the cleaned text of the owner is byte-identical to the original
    val digests = Round8Queries.queries.find(_.name == "n_dup_span_apply").get
      .fn(spark, dir).select("doc_id", "cleaned_md5")
      .as[(Long, String)].collect().toMap
    val originals = docs.select(col("doc_id"), md5(col("text")))
      .as[(Long, String)].collect().toMap
    assert(digests(1L) == originals(1L) && digests(4L) == originals(4L))
    assert(digests(5L) != originals(5L))
  }

  test("covariance aggregator matches the closed form on a tiny known set") {
    val d = 3
    val vecs = Seq(
      Array(1.0f, 2.0f, 0.0f),
      Array(2.0f, 4.0f, 1.0f),
      Array(3.0f, 6.0f, 0.0f))
    val cov = udaf(Round8Queries.CovAgg(d))
    val m = vecs.toDF("v").select(cov(col("v")).as("m"))
      .as[Array[Double]].head()
    def at(i: Int, j: Int) = m(i * d + j)
    // dim0 = (1,2,3): var_pop = 2/3; dim1 = 2·dim0: cov = 4/3, var = 8/3
    assert(math.abs(at(0, 0) - 2.0 / 3) < 1e-12)
    assert(math.abs(at(0, 1) - 4.0 / 3) < 1e-12)
    assert(math.abs(at(1, 1) - 8.0 / 3) < 1e-12)
    // dim2 = (0,1,0): mean 1/3, var_pop = 2/9; cov(0,2) = E[xy]−E[x]E[y]
    // = 2/3·1 − 2·1/3 = 0
    assert(math.abs(at(2, 2) - 2.0 / 9) < 1e-12)
    assert(math.abs(at(0, 2)) < 1e-12)
    // symmetry
    assert(at(1, 0) == at(0, 1) && at(2, 0) == at(0, 2))
  }

  test("priority sample is replayable: identical across runs and partitionings") {
    val q = Round8Queries.queries.find(_.name == "n_priority_sample").get
    val a = q.fn(spark, sf).collect().toSeq
    val b = q.fn(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
    // heavier docs must be able to outrank lighter ones: the sample's
    // mean weight exceeds the corpus mean (weight-biased selection)
    val sampleMean = a.map(_.getLong(2)).sum.toDouble / a.size
    val corpusMean = T(spark, sf, "documents")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean)
  }

  test("bucketed padding is never worse than pad-to-corpus-max") {
    val q = Round8Queries.queries.find(_.name == "n_pad_efficiency").get
    val rows = q.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bucketWaste = r.getAs[Double]("bucket_waste")
      val globalWaste = r.getAs[Double]("global_waste")
      assert(bucketWaste <= globalWaste + 1e-9, r.toString)
      assert(r.getAs[Long]("bucket_padded") <= r.getAs[Long]("global_padded"))
    }
  }

  test("covariance merge across partitions equals single-partition result") {
    val d = 4
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(200)(Array.fill(d)(rnd.nextFloat()))
    val cov = udaf(Round8Queries.CovAgg(d))
    val one = vecs.toDF("v").repartition(1)
      .select(cov(col("v")).as("m")).as[Array[Double]].head()
    val many = vecs.toDF("v").repartition(8)
      .select(cov(col("v")).as("m")).as[Array[Double]].head()
    one.zip(many).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("covariance fails loudly on a planted malformed vector, never silently skips") {
    val cov = udaf(Round8Queries.CovAgg(3))
    // a wrong-length vector would silently shrink the denominator if
    // skipped — the repo-wide policy is fail-loudly (round-8 verdict #4)
    val short = Seq(Array(1.0f, 2.0f, 3.0f), Array(1.0f)).toDF("v")
    val eShort = intercept[Exception] {
      short.select(cov(col("v"))).collect()
    }
    assert(eShort.getMessage != null)
    val withNull = Seq(Some(Array(1.0f, 2.0f, 3.0f)), None).toDF("v")
    intercept[Exception] {
      withNull.select(cov(col("v"))).collect()
    }
  }
}
