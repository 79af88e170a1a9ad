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
