package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IvfCellTopK

/** The IVF cell-ranking kernel: (a) codegen compiles (the r14
  * CaseMapDispatch lesson — GenerateUnsafeProjection THROWS on Janino
  * failure) and matches interpreted eval on the edge matrix; (b) the
  * kernel reproduces the HOF form it replaced
  * (array_sort(transform(C, dot/√ss), byScoreDesc)) over the real
  * fixture corpus, for both the k=1 assignment and the nprobe=4 probe
  * list. */
class IvfCellTopKSpec extends AnyFunSuite {
  import TestSpark._

  private val cells: Seq[(Int, Long, Seq[Long])] = Seq(
    (2, 14L, Seq(1L, 2L, 3L)),
    (0, 14L, Seq(1L, 2L, 3L)), // identical centroid: tie -> smaller id first
    (1, 9L, Seq(-3L, 0L, 0L)),
    (3, 1L, Seq(0L, 0L, 1L)))

  private def arrRef = BoundReference(0, ArrayType(LongType, containsNull = true), nullable = true)

  private def run(expr: org.apache.spark.sql.catalyst.expressions.Expression,
      row: InternalRow): Any = {
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val out = proj(row)
    val got = if (out.isNullAt(0)) null else out.get(0, expr.dataType)
    val want = expr.eval(row)
    def render(a: Any): String = a match {
      case d: ArrayData => d.toIntArray().mkString(",")
      case null => "null"
      case x => x.toString
    }
    assert(render(got) == render(want), s"codegen $got != interpreted $want")
    got
  }

  private def kexpr(k: Int) = graft.functions.IvfCellTopK(
    arrRef, cells.map(_._1).toArray,
    cells.map(t => math.sqrt(t._2.toDouble)).toArray,
    cells.map(_._3.toArray).toArray, k)

  test("codegen compiles and matches interpreted on the edge matrix") {
    def row(xs: Any*) = InternalRow(new GenericArrayData(xs))
    // plain ranking + identical-score tie -> smaller id first
    val top = run(kexpr(4), row(1L, 2L, 3L)).asInstanceOf[ArrayData].toIntArray()
    assert(top.take(2).sameElements(Array(0, 2)), top.mkString(","))
    // k=1 slice
    assert(run(kexpr(1), row(1L, 2L, 3L)).asInstanceOf[ArrayData].toIntArray()
      .sameElements(Array(0)))
    // null vector -> null result
    assert(run(kexpr(4), InternalRow(null)) == null)
    // null element -> every cell invalid -> id-ascending order
    assert(run(kexpr(4), row(1L, null, 3L)).asInstanceOf[ArrayData].toIntArray()
      .sameElements(Array(0, 1, 2, 3)))
    // negative scores still rank below positives, above invalid
    run(kexpr(4), row(-5L, 0L, -1L))
  }

  test("kernel == the HOF form over the fixture corpus (assignment and nprobe=4)") {
    val emb = T(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000) AS BIGINT))").as("qe"))
    val cellDim = emb
      .select(col("vec_id"), posexplode(col("qe")).as(Seq("dim", "q")))
      .join(T(spark, sf, "embeddings").select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("label"), col("dim")).agg(sum(col("q")).as("csum"))
    val fixCells: Seq[(Int, Long, Seq[Long])] = cellDim.groupBy(col("label"))
      .agg(
        expr("transform(array_sort(collect_list(struct(dim, csum))), x -> x.csum)").as("cs"),
        sum(col("csum") * col("csum")).as("ss"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getLong(2), r.getSeq[Long](1)))
      .sortBy(_._1)
    val cLit = typedLit(fixCells)
    val cellScores =
      """transform(C, x -> named_struct(
           's', CAST(aggregate(zip_with(x._3, qe, (p, q) -> p * q), 0L, (a, b) -> a + b) AS DOUBLE)
                / sqrt(CAST(x._2 AS DOUBLE)),
           'c', x._1))"""
    val byScoreDesc =
      "(l, r) -> CASE WHEN l.s > r.s THEN -1 WHEN l.s < r.s THEN 1 WHEN l.c < r.c THEN -1 ELSE 1 END"
    val both = emb.withColumn("C", cLit)
      .withColumn("hof4", expr(
        s"transform(slice(array_sort($cellScores, $byScoreDesc), 1, 4), x -> x.c)"))
      .withColumn("hof1",
        expr(s"-array_max(transform($cellScores, y -> named_struct('s', y.s, 'nc', -y.c))).nc"))
      .withColumn("k4", IvfCellTopK(col("qe"), fixCells, 4))
      .withColumn("k1", IvfCellTopK(col("qe"), fixCells, 1).getItem(0))
    val bad = both.filter(
      col("hof4") =!= col("k4") || col("hof1") =!= col("k1"))
    assert(bad.count() == 0, bad.limit(3).collect().mkString("\n"))
  }
}
