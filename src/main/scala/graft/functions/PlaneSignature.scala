package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd random-hyperplane signature over a float-vector
  * column: bit b of the result is set when `planes(b) · vec >= 0`.
  *
  * Replaces the composed higher-order-function form
  * (`reduce of when(aggregate(zip_with(hp_b, vec, ...)), 1<<b)`,
  * Round12Queries.withSig): that shape carried 8 interpreted lambda
  * chains and 8 typedLit plane arrays PER REFERENCE, and the ANN-tier
  * queries reference it up to 3× inside one pipelined stage — the
  * round-13 bench tail's 2–3 MiB task binaries (round-14 ask #2
  * attributed them with WarnAuditSpec's task-binary clause). This
  * expression compiles to one fused primitive loop with the plane
  * matrix shipped ONCE as a reference object, and the loop itself is
  * the kernel shape a 10⁹-vector corpus wants.
  *
  * Semantics mirror the HOF form exactly (PlaneSignatureSpec proves
  * equality): double accumulation left-to-right per plane; a NULL
  * vector, a length mismatch, or a NULL element yields bit 0 for the
  * affected plane (the HOF's null-poisoned aggregate fails its `>= 0`
  * test), so the result is never NULL.
  */
case class PlaneSignature(child: Expression, planes: Array[Array[Int]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"plane_signature expects array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val fl = isFloat
    var sig = 0
    var b = 0
    while (b < planes.length) {
      val hp = planes(b)
      if (n == hp.length) {
        var dot = 0.0
        var ok = true
        var i = 0
        while (i < n && ok) {
          if (arr.isNullAt(i)) ok = false
          else {
            dot += hp(i) * (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i))
            i += 1
          }
        }
        if (ok && dot >= 0) sig |= 1 << b
      }
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
    val childGen = child.genCode(ctx)
    val getter = if (isFloat) "getFloat" else "getDouble"
    val b = ctx.freshName("b")
    val i = ctx.freshName("i")
    val hp = ctx.freshName("hp")
    val dot = ctx.freshName("dot")
    val ok = ctx.freshName("ok")
    ev.copy(code = code"""
        ${childGen.code}
        int ${ev.value} = 0;
        if (!${childGen.isNull}) {
          for (int $b = 0; $b < $planesRef.length; $b++) {
            final int[] $hp = $planesRef[$b];
            if (${childGen.value}.numElements() == $hp.length) {
              double $dot = 0.0;
              boolean $ok = true;
              for (int $i = 0; $i < $hp.length && $ok; $i++) {
                if (${childGen.value}.isNullAt($i)) { $ok = false; }
                else { $dot += $hp[$i] * (double) ${childGen.value}.$getter($i); }
              }
              if ($ok && $dot >= 0) ${ev.value} |= 1 << $b;
            }
          }
        }""",
      isNull = FalseLiteral)
  }

  override def prettyName: String = "plane_signature"

  override protected def withNewChildInternal(newChild: Expression): PlaneSignature =
    copy(child = newChild)
}

object PlaneSignature {
  /** Column-API entry point. */
  def apply(vec: Column, planes: Seq[Seq[Int]]): Column =
    ColumnBridge.column(PlaneSignature(
      ColumnBridge.expression(vec), planes.map(_.toArray).toArray))
}
