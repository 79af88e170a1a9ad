package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** DuckDB's 1-arg numeric `trunc(x)`: truncation toward zero, keeping
  * the operand's numeric family (verified: trunc(1.9) = 1 decimal,
  * trunc(-1.9) = -1, trunc(1.9::DOUBLE) = 1.0 double). Spark's
  * floor/ceil return BIGINT for doubles, so the double case casts
  * back; integral operands pass through untouched.
  */
case class TruncDispatch(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  // built after analysis, so coercion never runs — cast the zero
  // literal and align the If branches explicitly
  override lazy val replacement: Expression = {
    def towardZero: Expression = If(
      LessThan(child, Cast(Literal(0), child.dataType)), Ceil(child), Floor(child))
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType => child
      case _: DecimalType => towardZero
      case FloatType | DoubleType => Cast(towardZero, child.dataType)
      case other => throw new IllegalArgumentException(
        s"trunc: expected a numeric operand, got ${other.simpleString(40)}")
    }
  }

  override def prettyName: String = "trunc"

  override protected def withNewChildInternal(newChild: Expression): TruncDispatch =
    copy(child = newChild)
}

/** format()'s argument adapter: DECIMAL/FLOAT → DOUBLE so
  * format_string's java conversions (%f, %e, %g) accept them;
  * everything else passes through untouched.
  */
case class FmtArgCast(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case _: DecimalType | FloatType => Cast(child, DoubleType)
    case _ => child
  }

  override def prettyName: String = "graft_fmtarg"

  override protected def withNewChildInternal(newChild: Expression): FmtArgCast =
    copy(child = newChild)
}

/** DuckDB's `divide(a, b)`: integer division (truncating toward zero,
  * like DuckDB's `//` on integers — verified divide(-7, 2) = -3) when
  * BOTH operands are integral, plain division otherwise (verified
  * divide(7.5, 2.0) = 3.75). Type-dispatched after analysis, same
  * pattern as [[TruncDispatch]].
  */
case class DivideDispatch(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // built post-analysis: coercion won't run, so feed IntegralDivide
  // the LongType operands it expects (result is BIGINT; DuckDB keeps
  // the narrower int type — value-identical)
  override lazy val replacement: Expression =
    if (integral(left.dataType) && integral(right.dataType))
      IntegralDivide(Cast(left, LongType), Cast(right, LongType))
    else Divide(Cast(left, DoubleType), Cast(right, DoubleType))

  override def prettyName: String = "divide"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DivideDispatch =
    copy(left = newLeft, right = newRight)
}
