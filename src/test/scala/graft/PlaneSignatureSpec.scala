package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Round12Queries

/** The native PlaneSignature kernel must be value-identical to the
  * higher-order-function signature it replaced (round-14 ask #2: the
  * HOF form was the 2–3 MiB task-binary class in the ANN tier). */
class PlaneSignatureSpec extends AnyFunSuite {
  import TestSpark._

  test("native signature equals the HOF form over the whole embeddings corpus") {
    val e = T(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    val both = e
      .withColumn("sig_native",
        graft.functions.PlaneSignature(col("embedding"), Round12Queries.annPlanes))
      .withColumn("sig_hof", Round12Queries.sigHof("embedding"))
    val diff = both.filter(col("sig_native") =!= col("sig_hof")).count()
    assert(diff == 0, s"$diff vectors disagree between native and HOF signatures")
    // and the signature space is actually used (not degenerate)
    val distinct = both.select(col("sig_native")).distinct().count()
    assert(distinct > 1, "signature collapsed to a single bucket")
  }

  test("null vector, length mismatch, and null element all yield bit 0, never NULL") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v",
      ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(null),
      Row(Seq.fill(3)(1.0f)), // wrong length (planes are 64-dim)
      Row((null +: Seq.fill(63)(1.0f)).toSeq)) // null element
    val df = spark.createDataFrame(rows, schema)
      .withColumn("sig",
        graft.functions.PlaneSignature(col("v"), Round12Queries.annPlanes))
    val got = df.select("sig").collect().map(_.get(0))
    assert(got.toSeq == Seq(0, 0, 0), s"edge rows gave ${got.toSeq}")
  }
}
