package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CharEntropy kernel: closed-form values, null/empty contract, and
  * codegen ≡ interpreted ≡ reference-Scala equality on real corpus
  * text.
  */
class CharEntropySpec extends AnyFunSuite {
  import TestSpark._
  import graft.functions.CharEntropy

  private def h(s: String): Option[Double] = {
    import spark.implicits._
    Seq(s).toDF("t").select(CharEntropy(col("t")).as("h"))
      .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
  }

  test("closed-form values") {
    assert(h("aaaa").contains(0.0))
    assert(h("ab").contains(1.0))
    assert(h("abab").contains(1.0))
    assert(h("abcd").contains(2.0))
    assert(h("abcdefgh").contains(3.0))
  }

  test("empty and null yield null") {
    import spark.implicits._
    assert(h("").isEmpty)
    val r = Seq(Option.empty[String]).toDF("t")
      .select(CharEntropy(col("t"))).collect().head
    assert(r.isNullAt(0))
  }

  test("codegen path equals the shared kernel on corpus text") {
    val rows = T(spark, sf, "documents").limit(50)
      .select(col("text"), CharEntropy(col("text")).as("h")).collect()
    rows.foreach { r =>
      val expect = CharEntropy.ofBytes(r.getString(0).getBytes("UTF-8"))
      assert(r.getDouble(1) == expect)
    }
    assert(rows.nonEmpty)
  }

  test("SQL registration: char_entropy(text)") {
    CharEntropy.register(spark)
    T.views(spark, sf, "documents")
    val n = spark.sql(
      "SELECT char_entropy(text) AS h FROM documents WHERE char_entropy(text) > 3.0")
      .count()
    assert(n > 0)
  }
}
