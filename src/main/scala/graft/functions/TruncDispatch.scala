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

/** DuckDB's `ceil`/`ceiling`/`floor` result typing (round-13 fuzz
  * finding): DOUBLE for every non-decimal numeric INCLUDING integers
  * (typeof(ceil(5)) = DOUBLE, value 5.0), FLOAT for REAL, DECIMAL(p,0)
  * for decimals — where Spark returns BIGINT for doubles and ints, so
  * `CAST(ceil(x) AS VARCHAR)` printed '1' against DuckDB's '1.0' and
  * any served ceil/floor silently changed the result column's type.
  * Values are identical; only the carrier type dispatches here.
  */
case class CeilFloorDispatch(child: Expression, isCeil: Boolean)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    // an integer is already its own ceiling/floor; DuckDB still
    // returns it as DOUBLE
    case ByteType | ShortType | IntegerType | LongType => Cast(child, DoubleType)
    case NullType => Cast(child, DoubleType)
    // Spark: DECIMAL(p-s+1, 0); DuckDB: DECIMAL(p, 0) — values equal
    case _: DecimalType => if (isCeil) Ceil(child) else Floor(child)
    // NOT Spark's Ceil/Floor: those return LONG, so ceil(NaN) became
    // 0 and ceil(1e300) saturated — Math.ceil/floor keep the double
    // (and its NaN/Inf/-0.0) like DuckDB
    case DoubleType => FloorCeilExpr(child, isCeil)
    case FloatType => Cast(FloorCeilExpr(Cast(child, DoubleType), isCeil), FloatType)
    case other => throw new IllegalArgumentException(
      s"${if (isCeil) "ceil" else "floor"}: expected a numeric operand, " +
        s"got ${other.simpleString(40)}")
  }

  override def prettyName: String = if (isCeil) "ceil" else "floor"

  override protected def withNewChildInternal(newChild: Expression): CeilFloorDispatch =
    copy(child = newChild)
}

/** Codegen'd double-preserving ceil/floor (Math.ceil/Math.floor). */
case class FloorCeilExpr(child: Expression, isCeil: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    if (isCeil) math.ceil(v.asInstanceOf[Double]) else math.floor(v.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"java.lang.Math.${if (isCeil) "ceil" else "floor"}($c)")
  override def prettyName: String = if (isCeil) "ceil" else "floor"
  override protected def withNewChildInternal(newChild: Expression): FloorCeilExpr =
    copy(child = newChild)
}

/** DuckDB's floating round (round-13 fuzz finding): it rounds the
  * BINARY value — floor(|x|*10^n + 0.5)/10^n, sign restored — where
  * Spark rounds the shortest DECIMAL rendering with HALF_UP. The two
  * agree except at representability boundaries, where they silently
  * differ: 1.005 stores as 1.00499999…, so round(1.005, 2) is 1.0
  * there but 1.01 on Spark's string path. Verified against DuckDB on
  * 4008 random cases + the classic boundaries (1.005@2 -> 1.0,
  * 2.675@2 -> 2.68 — 2.675*100 is exactly 267.5 in binary —
  * -0.001@1 -> -0.0 signed).
  */
object DuckRound {
  def round(x: Double, n: Int): Double = {
    if (x.isNaN || x.isInfinite) return x
    if (n > 323) return x
    if (n < -323) return if (x < 0 || 1.0 / x < 0) -0.0 else 0.0
    val p = math.pow(10.0, n)
    val v = math.floor(math.abs(x) * p + 0.5) / p
    if (x < 0 || (x == 0.0 && 1.0 / x < 0)) -v else v
  }
}

/** Codegen'd binary expression over (DOUBLE, INT). */
case class DuckRoundExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(x: Any, n: Any): Any =
    DuckRound.round(x.asInstanceOf[Double], n.asInstanceOf[Int])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (x, n) => s"graft.functions.DuckRound.round($x, $n)")
  override def prettyName: String = "round"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DuckRoundExpr =
    copy(left = newLeft, right = newRight)
}

/** round() dispatch: DOUBLE/FLOAT/ints take the DuckDB binary-value
  * path above (ints because DuckDB types round(5, -1) DOUBLE = 10.0);
  * FLOAT results cast back to FLOAT; DECIMAL keeps Spark's exact
  * HALF_UP Round (identical to DuckDB's half-away on exact decimals).
  * Unlike Spark's builtin, the scale may be a runtime column — DuckDB
  * allows it.
  */
case class RoundDispatch(child: Expression, scale: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  override def left: Expression = child
  override def right: Expression = scale
  override lazy val replacement: Expression = child.dataType match {
    case _: DecimalType =>
      Round(child, scale)
    case FloatType =>
      Cast(DuckRoundExpr(Cast(child, DoubleType), Cast(scale, IntegerType)),
        FloatType)
    case ByteType | ShortType | IntegerType | LongType | DoubleType | NullType =>
      DuckRoundExpr(Cast(child, DoubleType), Cast(scale, IntegerType))
    case other => throw new IllegalArgumentException(
      s"round: expected a numeric operand, got ${other.simpleString(40)}")
  }
  override def prettyName: String = "round"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RoundDispatch =
    copy(child = newLeft, scale = newRight)
}

/** `date ± INTERVAL` is TIMESTAMP-typed in DuckDB for EVERY interval
  * grain and operand order (typeof pins: +'3' DAY, +'1' MONTH,
  * +'1' YEAR, -'1' DAY, INTERVAL+date — all TIMESTAMP); Spark keeps
  * DATE for day-precision intervals. sqlServed wraps the date operand
  * of a literal-interval addition in this dispatch: dates promote to
  * TIMESTAMP, every other type passes through. (round-13 fuzz)
  */
case class DateToTsOperand(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case DateType => Cast(child, TimestampType,
      Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    case _ => child
  }
  override def prettyName: String = "graft_date_ts_operand"
  override protected def withNewChildInternal(newChild: Expression): DateToTsOperand =
    copy(child = newChild)
}
