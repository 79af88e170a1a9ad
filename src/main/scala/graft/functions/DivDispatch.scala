package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Divide, DivideDTInterval, DivideYMInterval, EqualTo, Expression, If, Literal, RuntimeReplaceable}
import org.apache.spark.sql.types.{DayTimeIntervalType, DoubleType, YearMonthIntervalType}

/** DuckDB's `/` operator, type- and zero-faithfully (probe tier 15,
  * verified against DuckDB 2026-08-15): division is ALWAYS DOUBLE
  * there (typeof(1.5/2.5) = DOUBLE, typeof(3/2) = DOUBLE = 1.5) where
  * Spark keeps DECIMAL for decimal operands (5.0/2 → 2.500000), and a
  * zero divisor yields NULL (1/0, 1.5/0.0, INTERVAL/0 — all NULL)
  * where Spark's ANSI mode raises. The serving plane rewrites every
  * parsed Divide to this dispatch; the divisor guard nulls the zero
  * before the builtin sees it, so the ANSI error can never fire.
  * Interval numerators keep Spark's interval division (DuckDB returns
  * INTERVAL there too), with the same guarded divisor.
  */
case class DivDispatch(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  private def guarded(e: Expression): Expression =
    If(EqualTo(e, Literal(0.0)), Literal(null, DoubleType), e)

  // built AFTER analysis — cast operand types explicitly
  override lazy val replacement: Expression = left.dataType match {
    case _: DayTimeIntervalType =>
      DivideDTInterval(left, guarded(Cast(right, DoubleType)))
    case _: YearMonthIntervalType =>
      DivideYMInterval(left, guarded(Cast(right, DoubleType)))
    case _ =>
      Divide(Cast(left, DoubleType), guarded(Cast(right, DoubleType)))
  }

  override def prettyName: String = "graft_div"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DivDispatch =
    copy(left = newLeft, right = newRight)
}
