package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Divide, EqualTo, Expression, If, IntegralDivide, Literal, RuntimeReplaceable}
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** DuckDB's `//` operator, type-faithfully (verified against DuckDB
  * 1.5): INTEGER // INTEGER truncates toward zero (-7 // 2 = -3), but
  * any non-integral operand makes it PLAIN division (7.5 // 2 = 3.75).
  * A blanket rewrite to Spark's `div` would silently floor the
  * non-integral case, so the dialect shim emits this dispatching
  * expression instead; the analyzer swaps in the replacement, so
  * execution is the underlying builtin's.
  */
case class IntDivDispatch(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // the replacement is built AFTER analysis, so Spark's implicit type
  // coercion never runs on it — cast operands to the builtin's input
  // types explicitly. A zero divisor yields NULL like DuckDB (1//0 is
  // NULL there, probe tier 15) instead of Spark's ANSI error; the
  // divisor is nulled rather than the division wrapped so the builtin
  // never sees the zero.
  override lazy val replacement: Expression =
    if (integral(left) && integral(right)) {
      val r = Cast(right, LongType)
      IntegralDivide(Cast(left, LongType),
        If(EqualTo(r, Literal(0L)), Literal(null, LongType), r))
    } else {
      val r = Cast(right, DoubleType)
      Divide(Cast(left, DoubleType),
        If(EqualTo(r, Literal(0.0)), Literal(null, DoubleType), r))
    }

  override def prettyName: String = "graft_intdiv"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDivDispatch =
    copy(left = newLeft, right = newRight)
}
