package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, CaseWhen, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, Literal, Or, RuntimeReplaceable, ShiftLeft, ShiftRight}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** DuckDB's `<<` / `>>` operators, rule-by-rule (round-13 fuzz v4;
  * verified against DuckDB 2026-08-16). Spark's parser cannot even
  * parse `>>` (PARSE_SYNTAX_ERROR), and its `<<` wraps silently where
  * DuckDB is loud, so the serving plane rewrites both operators to
  * this dispatch. The result keeps the LEFT operand's integral type.
  *
  * Verified DuckDB semantics:
  *   x >> n : arithmetic shift; n < 0 or n >= width(x) → 0 (even for
  *            negative x: -8 >> 50 = 0, -8 >> -1 = 0)
  *   x << n : n < 0            → error (checked before the zero case:
  *                               0 << -5 errors)
  *            x = 0            → 0 (even when n >= width: 0 << 35 = 0)
  *            x < 0            → error ("cannot left-shift negative")
  *            n >= width(x)    → error ("out of range")
  *            x > MAX(x) >> n  → error ("overflow in left shift";
  *                               127::TINYINT << 1 errors)
  *   NULL on either side      → NULL
  */
case class ShiftDispatch(left: Expression, right: Expression, isLeft: Boolean)
    extends BinaryExpression with RuntimeReplaceable {

  private def widthAndMax: (Int, Long) = left.dataType match {
    case ByteType => (8, Byte.MaxValue.toLong)
    case ShortType => (16, Short.MaxValue.toLong)
    case LongType => (64, Long.MaxValue)
    case _ => (32, Int.MaxValue.toLong)
  }

  // built AFTER analysis — the left operand's resolved type picks the
  // width, overflow bound, and result cast
  override lazy val replacement: Expression = {
    val (w, max) = widthAndMax
    val useLong = left.dataType == LongType
    val x = Cast(left, if (useLong) LongType else IntegerType)
    // range-check the amount at LongType: a BIGINT amount outside int
    // range must reach the n >= width / n < 0 arms (x >> 5e9 is 0 in
    // DuckDB, x << 5e9 its out-of-range error), not ANSI CAST_OVERFLOW.
    // The narrowed int amount is only evaluated in branches where the
    // long-typed guards already proved 0 <= n < width <= 64.
    val nL = Cast(right, LongType)
    val n = Cast(nL, IntegerType)
    // replacement is built AFTER analysis, so no TypeCoercion runs on
    // it — the VOID-typed raise_error must be cast to the branch type
    // by hand or CaseWhen rejects the mixed input types
    def err(msg: String): Expression =
      Cast(org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
        .lookupFunctionBuilder(org.apache.spark.sql.catalyst.FunctionIdentifier("raise_error"))
        .get(Seq(Literal(msg))), if (useLong) LongType else IntegerType)
    val zero: Expression = if (useLong) Literal(0L) else Literal(0)
    val shifted: Expression =
      if (isLeft) ShiftLeft(x, n) else ShiftRight(x, n)
    // NULL-in-NULL-out precedes every rule (0 << NULL is NULL, not the
    // x=0 shortcut's 0)
    val anyNull = Or(
      org.apache.spark.sql.catalyst.expressions.IsNull(x),
      org.apache.spark.sql.catalyst.expressions.IsNull(nL))
    val nullRes: Expression =
      Literal(null, if (useLong) LongType else IntegerType)
    val body: Expression =
      if (isLeft) {
        val maxLit: Expression = if (useLong) Literal(max) else Literal(max.toInt)
        CaseWhen(Seq(
          (anyNull, nullRes),
          (LessThan(nL, Literal(0L)),
            err("<<: cannot left-shift by a negative number (DuckDB Out of Range)")),
          (EqualTo(x, zero), zero),
          (LessThan(x, zero),
            err("<<: cannot left-shift a negative number (DuckDB Out of Range)")),
          (GreaterThanOrEqual(nL, Literal(w.toLong)),
            err(s"<<: shift amount out of range for the ${w}-bit operand (DuckDB Out of Range)")),
          (GreaterThan(x, ShiftRight(maxLit, n)),
            err("<<: overflow in left shift (DuckDB Out of Range)"))),
          Some(shifted))
      } else {
        CaseWhen(Seq(
          (anyNull, nullRes),
          (Or(LessThan(nL, Literal(0L)), GreaterThanOrEqual(nL, Literal(w.toLong))), zero)),
          Some(shifted))
      }
    if (left.dataType == IntegerType || left.dataType == LongType) body
    else Cast(body, left.dataType)
  }

  override def prettyName: String = if (isLeft) "graft_shiftl" else "graft_shiftr"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShiftDispatch =
    copy(left = newLeft, right = newRight)
}
