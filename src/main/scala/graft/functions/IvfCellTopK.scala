package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd IVF coarse-cell ranking over a quantized
  * integer-vector column: returns the ids of the top-`k` cells by
  * score `dot_long(cs_c, qe) / sqrt(ss_c)`, ordered by (score DESC,
  * cell id ASC) — exactly the comparator the HOF form used
  * (`array_sort(transform(C, ...), byScoreDesc)`, and `array_max` over
  * `(s, -c)` structs for the k=1 assignment, which agree for every
  * non-NaN score).
  *
  * Replaces the interpreted form in n_ann_ivf_portable: a typedLit
  * cell matrix + `transform(C, aggregate(zip_with(...)))` evaluated as
  * k interpreted lambda chains of d multiply-adds PER ROW (k cells ×
  * 64 dims × corpus rows of boxed lambda calls), shipped per
  * reference. This expression compiles to one fused primitive loop
  * with the centroid matrix shipped ONCE as a reference object — the
  * same kernel shape as [[PlaneSignature]].
  *
  * Semantics (IvfCellTopKSpec proves codegen == interpreted; the
  * oracle pins the query values at every SF):
  *   - dot is plain long multiply-add left-to-right (the HOF's LONG
  *     aggregate; |csum| ≤ 2e6 and |qe_i| ≤ ~3e3 on the quantized
  *     fixture, 4 orders below overflow);
  *   - score = (double) dot / sqrt((double) ss) — sqrt of a constant
  *     is precomputed once, bit-identical to the per-row sqrt;
  *   - ordering: score DESC via primitive </> (ties, including
  *     -0.0 == 0.0, fall to cell id ASC — the byScoreDesc comparator);
  *   - a NULL input vector yields NULL (the HOF's null-poisoned
  *     chain); a NULL element or a length-mismatched cell is not
  *     exercised by any fixture (quantization preserves length and
  *     nullability) and ranks that cell last, id-ascending.
  */
case class IvfCellTopK(
    child: Expression,
    ids: Array[Int],
    denoms: Array[Double],
    mats: Array[Array[Long]],
    k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ivf_cell_topk expects array<bigint>, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    new GenericArrayData(IvfCellTopK.topK(arr, ids, denoms, mats, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    val denomsRef = ctx.addReferenceObj("denoms", denoms, "double[]")
    val matsRef = ctx.addReferenceObj("mats", mats, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.IvfCellTopK$$.MODULE$$.topK(
         |    $c, $idsRef, $denomsRef, $matsRef, $k));""".stripMargin)
  }

  override def prettyName: String = "ivf_cell_topk"

  override protected def withNewChildInternal(newChild: Expression): IvfCellTopK =
    copy(child = newChild)
}

object IvfCellTopK {
  /** Shared kernel: one primitive pass over the cells, selection of
    * the top-k by (score desc, id asc). Named `topK` (no TreeNode
    * collision — the r14 CaseMapDispatch static-forwarder lesson). */
  def topK(arr: ArrayData, ids: Array[Int], denoms: Array[Double],
      mats: Array[Array[Long]], k: Int): Array[Int] = {
    val n = arr.numElements()
    val nc = ids.length
    val scores = new Array[Double](nc)
    val valid = new Array[Boolean](nc)
    var c = 0
    while (c < nc) {
      val cs = mats(c)
      if (cs.length == n) {
        var dot = 0L
        var ok = true
        var i = 0
        while (i < n && ok) {
          if (arr.isNullAt(i)) ok = false
          else { dot += cs(i) * arr.getLong(i); i += 1 }
        }
        if (ok) { scores(c) = dot.toDouble / denoms(c); valid(c) = true }
      }
      c += 1
    }
    val order = Array.range(0, nc)
    // selection of min(k, nc) by the byScoreDesc comparator: valid
    // before invalid, score desc (primitive </>, so -0.0 == 0.0 ties
    // fall through), id asc
    val m = math.min(k, nc)
    val out = new Array[Int](m)
    var filled = 0
    while (filled < m) {
      var best = -1
      var j = filled
      while (j < nc) {
        val cand = order(j)
        if (best == -1) best = j
        else {
          val b = order(best)
          val better =
            if (valid(cand) != valid(b)) valid(cand)
            else if (valid(cand) && scores(cand) > scores(b)) true
            else if (valid(cand) && scores(cand) < scores(b)) false
            else ids(cand) < ids(b)
          if (better) best = j
        }
        j += 1
      }
      val tmp = order(filled); order(filled) = order(best); order(best) = tmp
      out(filled) = ids(order(filled))
      filled += 1
    }
    out
  }

  /** Column-API entry point; `cells` = (id, ss, centroid sums). */
  def apply(vec: Column, cells: Seq[(Int, Long, Seq[Long])], k: Int): Column =
    ColumnBridge.column(IvfCellTopK(
      ColumnBridge.expression(vec),
      cells.map(_._1).toArray,
      cells.map(t => math.sqrt(t._2.toDouble)).toArray,
      cells.map(_._3.toArray).toArray,
      k))
}
