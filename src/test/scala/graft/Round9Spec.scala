package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators: semantic properties beyond the DuckDB hash check.
  *
  *   - the mergeable-top-k k-NN join must equal the window-rank
  *     formulation row for row (the aggregate path is EXACT top-k
  *     selection, not approximate);
  *   - k-means assignment must partition the corpus and be
  *     deterministic;
  *   - the logreg trainer must actually learn: beat the majority-class
  *     accuracy and the uninformed-model log-loss (ln 2).
  */
class Round9Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("n_knn_join_topk equals the window-rank formulation exactly") {
    val emb = T(spark, sf, "embeddings")
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc_nulls_last, col("vec_id").asc_nulls_last)
    val viaWindow = emb.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .withColumn("sim", round(graft.queries.SimilarityQueries.cosine("qv", "embedding"), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select(col("qid"), col("rk").cast("int").as("rk"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("rk"))
      .collect().toSeq
    val viaTopK = q("n_knn_join_topk").collect().toSeq
    assert(viaTopK == viaWindow)
    assert(viaTopK.nonEmpty)
  }

  test("n_kmeans_lloyd partitions the corpus and is deterministic") {
    val out = q("n_kmeans_lloyd").collect()
    val total = T(spark, sf, "embeddings").count()
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    assert(out.forall { r =>
      val m = r.getDouble(2); m >= -1.0 && m <= 1.0
    })
    val again = q("n_kmeans_lloyd").collect()
    assert(out.toSeq == again.toSeq)
  }

  test("n_bpe_train: 3 merges, concatenative, non-increasing frequency") {
    val rows = q("n_bpe_train").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0)
    }
    // a merge can only remove pair occurrences, and every new pair that
    // contains the merged token is bounded by its count — so the chosen
    // frequency never increases across steps
    val freqs = rows.map(_.getLong(4)).toSeq
    assert(freqs == freqs.sorted.reverse, s"not non-increasing: $freqs")
  }

  test("n_quality_logreg learns: beats majority accuracy and ln-2 loss") {
    val row = q("n_quality_logreg").collect().head
    val docs = T(spark, sf, "documents")
    val n = docs.count().toDouble
    val pos = docs.filter(col("n_chars") >= 300).count().toDouble
    val majority = math.max(pos, n - pos) / n
    val acc = row.getAs[Double]("accuracy")
    val loss = row.getAs[Double]("log_loss")
    assert(row.getAs[Long]("n_docs") == n.toLong)
    assert(acc > majority, s"accuracy $acc <= majority baseline $majority")
    assert(loss < math.log(2.0), s"log_loss $loss >= ln 2")
  }
}
