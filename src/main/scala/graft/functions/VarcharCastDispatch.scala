package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression,
  RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-parity floating→VARCHAR text (probe 26: an explicit
  * CAST(d AS VARCHAR) inside SQL carried Java's rendering — '1.0E8'
  * where DuckDB prints '100000000.0', 'NaN'/'Infinity' where DuckDB
  * prints 'nan'/'inf'). Rules pinned live: non-finite → nan/inf/-inf;
  * plain decimal (integral values keep ".0") for 1e-6 <= |v| < 1e21;
  * shortest-digits scientific with a signed two-digit exponent
  * outside ('1.5e-07', '1e+21'); a negative-zero DOUBLE keeps its
  * sign ('-0.0'). The same rule set RowEncoders.fmtFloating applies
  * to bare result values (probe 12) — this is its expression face for
  * string-typed results produced INSIDE the query.
  *
  * Round-13 fuzz finding: the CAST text and the JSON text use
  * DIFFERENT plain-decimal windows in DuckDB itself — casts print
  * plain for 1e-4 <= |v| < 1e16 ('0.0001' but '1e-05'; '1e15' plain
  * but '1e+16'), while to_json prints plain for 1e-6 <= |v| < 1e21
  * with an unpadded exponent ('1e-7', '1e21'). The original probe-26
  * pin generalized the JSON window to casts, so CAST(0.000001 AS
  * VARCHAR) silently printed '0.000001' where DuckDB prints '1e-06'.
  * This renderer now carries the CAST window; RowEncoders.fmtFloating
  * keeps the JSON window.
  */
object DuckFloatText {
  def render(d: Double): UTF8String =
    if (d.isNaN) UTF8String.fromString("nan")
    else if (d == Double.PositiveInfinity) UTF8String.fromString("inf")
    else if (d == Double.NegativeInfinity) UTF8String.fromString("-inf")
    else UTF8String.fromString(fromDigits(java.lang.Double.toString(d)))

  def render(f: Float): UTF8String =
    if (f.isNaN) UTF8String.fromString("nan")
    else if (f == Float.PositiveInfinity) UTF8String.fromString("inf")
    else if (f == Float.NegativeInfinity) UTF8String.fromString("-inf")
    else UTF8String.fromString(fromDigits(java.lang.Float.toString(f)))

  /** digits = the JVM's shortest round-trip rendering; reformatted to
    * DuckDB's cast text (keeps -0.0, CSV-style padded exponent).
    */
  private def fromDigits(digits: String): String = {
    val bd = new java.math.BigDecimal(digits)
    val absV = bd.abs.doubleValue
    val neg = digits.startsWith("-")
    if (bd.unscaledValue.signum == 0) if (neg) "-0.0" else "0.0"
    else if (absV >= 1e-4 && absV < 1e16) {
      val plain = bd.stripTrailingZeros.toPlainString
      if (plain.contains('.')) plain else plain + ".0"
    } else {
      val stripped = bd.stripTrailingZeros
      val digs = stripped.unscaledValue.abs.toString
      val exp = digs.length - 1 - stripped.scale
      val mant = if (digs.length == 1) digs else digs.head + "." + digs.tail
      val expStr = (if (exp < 0) "e-" else "e+") + f"${math.abs(exp)}%02d"
      (if (neg) "-" else "") + mant + expStr
    }
  }
}

/** The codegen'd expression over a DOUBLE or FLOAT child. */
case class FloatingVarchar(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = v match {
    case d: java.lang.Double => DuckFloatText.render(d.doubleValue)
    case f: java.lang.Float => DuckFloatText.render(f.floatValue)
    case other => UTF8String.fromString(other.toString)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DuckFloatText.render($c)")
  override def prettyName: String = "graft_floating_varchar"
  override protected def withNewChildInternal(newChild: Expression): FloatingVarchar =
    copy(child = newChild)
}

/** CAST(x AS VARCHAR) dispatch: floating sources take the DuckDB text
  * renderer, everything else keeps Spark's cast (whose text already
  * matches — probe sweeps cover ints, decimals, dates, intervals).
  */
case class VarcharCastDispatch(child: Expression, tryMode: Boolean)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | FloatType => FloatingVarchar(child)
    case _ =>
      // a replacement is not visited by analyzer rules, so the
      // timezone-aware cast must carry its zone explicitly (a bare
      // timestamp->string Cast stays unresolved and fails the plan)
      val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      if (tryMode) Cast(child, StringType, tz, EvalMode.TRY)
      else Cast(child, StringType, tz)
  }

  override def prettyName: String =
    if (tryMode) "graft_try_varchar_cast" else "graft_varchar_cast"

  override protected def withNewChildInternal(newChild: Expression): VarcharCastDispatch =
    copy(child = newChild)
}
