package graft

import graft.functions.CosineSimilarity
import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen'd cosine ≡ higher-order-function cosine. */
class CosineSpec extends AnyFunSuite {
  import TestSpark._

  test("native expression equals HOF formulation on real embeddings") {
    val emb = T(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        SimilarityQueries.cosine("qv", "embedding").as("native"),
        SimilarityQueries.cosineHof("qv", "embedding").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("null and shape edge cases") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical → 1.0
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal → 0.0
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)))   // zero norm → null
      .toDF("a", "b")
    val got = df.select(CosineSimilarity(col("a"), col("b")).as("c")).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(got(1).getDouble(0)) < 1e-15)
    assert(got(2).isNullAt(0))
    // length mismatch → null
    val mism = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(CosineSimilarity(col("a"), col("b")).as("c")).collect()
    assert(mism(0).isNullAt(0))
  }

  test("registered SQL function works") {
    CosineSimilarity.register(spark)
    T.views(spark, sf, "embeddings")
    val r = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""")
      .collect()
    assert(r.length == 1 && !r(0).isNullAt(0))
  }
}
