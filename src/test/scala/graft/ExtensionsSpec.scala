package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registry exposure of the native kernels (GraftExtensions):
  * a SQL-only client must reach the same codegen'd expressions the
  * Column API uses.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("cosine_sim and simhash64 are callable from SQL and agree with the Column API") {
    GraftExtensions.injectInto(spark)
    T(spark, sf, "embeddings").limit(50).createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS self_sim,
                simhash64(transform(embedding, x -> xxhash64(x))) AS sig
         FROM emb_ext ORDER BY vec_id""").collect()
    val viaCol = T(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"),
        graft.functions.CosineSimilarity(col("embedding"), col("embedding")).as("self_sim"),
        graft.functions.SimHash64(expr("transform(embedding, x -> xxhash64(x))")).as("sig"))
      .orderBy(col("vec_id")).collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    viaSql.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("extensions class wires the registry at session build time") {
    import org.apache.spark.sql.SparkSession
    // force a genuinely new session — getOrCreate would hand back the
    // suite session (where injectInto already ran) and prove nothing.
    // withExtensions is the programmatic spelling of the
    // spark.sql.extensions static conf (which cannot change once the
    // shared test SparkContext exists).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s2 ne spark)
      val r = s2.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c").collect()
      assert(math.abs(r.head.getDouble(0)) < 1e-9)
    } finally {
      // do NOT close s2 — it shares the suite SparkContext and close()
      // would stop it for every later suite; just restore the defaults
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
