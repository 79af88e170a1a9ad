package graft

import graft.functions.SimHash64
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native SimHash64 ≡ higher-order-function formulation. */
class SimHashSpec extends AnyFunSuite {
  import TestSpark._

  test("native simhash equals HOF simhash on real documents") {
    val docs = T(spark, sf, "documents")
      .select(col("doc_id"), expr("transform(split(text, ' '), x -> xxhash64(x))").as("hs"))
    val both = docs.select(
        SimHash64(col("hs")).as("native"),
        expr("""aggregate(sequence(0, 63), 0L, (acc, b) ->
             acc + if(aggregate(hs, 0, (v, h) -> v + if(((h >> b) & 1) = 1, 1, -1)) > 0,
                      shiftleft(1L, b), 0L))""").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
