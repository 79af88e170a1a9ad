package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BRound, Cast, EvalMode, Expression, Literal, Round, RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.types._

/** DuckDB casts to integer types by ROUNDING, not truncating — and the
  * rounding rule depends on the SOURCE type (all pinned live, probe 13):
  *
  *   - DECIMAL → int: half AWAY from zero (CAST(12.7 AS INT)=13,
  *     CAST(-2.5 AS INT)=-3; numeric literals are DECIMAL in DuckDB)
  *   - DOUBLE/FLOAT → int: half to EVEN (CAST(2.5::DOUBLE AS INT)=2,
  *     3.5::FLOAT → 4 — C nearbyint semantics)
  *   - VARCHAR → int: parse then half AWAY ('12.5' → 13, '-12.5' → -13)
  *
  * Spark's cast truncates fractional numerics and rejects fractional
  * strings — a silent serving-plane divergence on every such cast.
  * Dispatches on the RESOLVED child type; integral inputs keep the
  * plain cast (never a double detour, so BIGINT-range values keep
  * full precision) and non-numeric inputs keep Spark's (ANSI-loud)
  * cast, mirroring DuckDB's own conversion errors. `tryMode` runs
  * every fallible step under EvalMode.TRY (NULL instead of error).
  */
case class IntCastDispatch(child: Expression, target: DataType, tryMode: Boolean)
    extends UnaryExpression with RuntimeReplaceable {

  private def cast(e: Expression, t: DataType): Expression =
    if (tryMode) Cast(e, t, None, EvalMode.TRY) else Cast(e, t)

  override lazy val replacement: Expression = child.dataType match {
    case _: DecimalType =>
      cast(Round(child, Literal(0)), target)
    case DoubleType | FloatType =>
      cast(BRound(child, Literal(0)), target)
    case _: StringType =>
      // integral-looking strings cast DIRECTLY (the double detour lost
      // precision past 2^53: CAST('9223372036854775807' AS BIGINT)
      // must be exact); only strings with a fractional/exponent part
      // take the parse-then-round-half-away route
      import org.apache.spark.sql.catalyst.expressions.{If, RLike}
      If(RLike(child, Literal("^\\s*[+-]?[0-9]+\\s*$")),
        cast(child, target),
        cast(Round(cast(child, DoubleType), Literal(0)), target))
    case _ =>
      cast(child, target)
  }

  override def prettyName: String =
    if (tryMode) "graft_try_int_cast" else "graft_int_cast"

  override protected def withNewChildInternal(newChild: Expression): IntCastDispatch =
    copy(child = newChild)
}
