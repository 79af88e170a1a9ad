package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float-vector columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(...))`, SimilarityQueries.cosine) allocates an
  * intermediate array and dispatches a lambda per element; this
  * expression compiles to a single fused primitive loop over the two
  * `ArrayData` buffers — the kernel shape that matters when scoring
  * 10⁹ vectors. Semantics are identical (double accumulation,
  * left-to-right), so it is drop-in for oracle-checked queries.
  *
  * Null/shape rules: null if either side is null, empty, length-
  * mismatched, or zero-normed (division guard), matching the SQL
  * fold + divide behavior.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // r15: accept float or double element types on either side — the
    // k-means recomputed centroids are array<double> (rounded means)
    // while embeddings are array<float>; accumulation reads each
    // element as double exactly like the HOF's CAST(x AS DOUBLE).
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  @inline private def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n == 0 || n != b.numElements()) return null
    val fa = isFloat(left.dataType); val fb = isFloat(right.dataType)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getterA = if (isFloat(left.dataType)) "getFloat" else "getDouble"
      val getterB = if (isFloat(right.dataType)) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
        final int $n = $a.numElements();
        if ($n == 0 || $n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $x = (double) $a.$getterA($i);
            final double $y = (double) $b.$getterB($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
          if ($denom == 0.0) { ${ev.isNull} = true; }
          else { ${ev.value} = $dot / $denom; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `cosine_sim($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: `SELECT cosine_sim(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
}
