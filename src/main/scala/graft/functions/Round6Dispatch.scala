package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ArrayRepeat, BinaryExpression, Cast, Expression, Flatten, RuntimeReplaceable, StringRepeat, TernaryExpression, TruncTimestamp, UnaryExpression}
import org.apache.spark.sql.types._

/** DuckDB's `repeat` is overloaded: strings repeat as strings, LISTS
  * repeat as concatenated lists (repeat([1,2], 2) = [1,2,1,2]).
  * Spark's `repeat` is string-only, so this dispatches on the
  * resolved argument type (same pattern as LenDispatch/EpochMsDispatch).
  */
case class RepeatDispatch(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = left.dataType match {
    case _: ArrayType => Flatten(ArrayRepeat(left, right))
    case _ => StringRepeat(Cast(left, StringType), right)
  }
  override def prettyName: String = "repeat"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RepeatDispatch =
    copy(left = l, right = r)
}

/** DuckDB `datetrunc(part, x)`: DATE in → DATE out, TIMESTAMP in →
  * TIMESTAMP out. Spark's `date_trunc` always returns TIMESTAMP, so
  * the DATE case casts back (values identical — midnight truncation).
  */
case class DateTruncDispatch(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  // the replacement is not a child, so ResolveTimeZone never visits
  // it — the session timezone must be supplied explicitly or the
  // timezone-aware TruncTimestamp/Cast stay unresolved forever
  override lazy val replacement: Expression = {
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    def toTs(e: Expression) = Cast(e, TimestampType, tz)
    // round-13 fuzz: DuckDB dispatches the RESULT type on the PART,
    // not the input — date-grain parts return DATE even for TIMESTAMP
    // inputs, and time-grain parts return TIMESTAMP even for DATE
    // inputs (typeof pins: ('year', ts) = DATE; ('hour', date) =
    // TIMESTAMP). A non-foldable part keeps the input-type rule.
    val dateGrain =
      if (left.foldable && left.eval(null) != null) {
        val p = String.valueOf(left.eval(null)).toLowerCase.stripSuffix("s")
        Set("year", "isoyear", "quarter", "month", "week", "day",
          "decade", "century", "millennium", "millenium").contains(p)
      } else right.dataType == DateType
    if (dateGrain) Cast(TruncTimestamp(left, toTs(right), tz), DateType, tz)
    else TruncTimestamp(left, toTs(right), tz)
  }
  override def prettyName: String = "datetrunc"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DateTruncDispatch =
    copy(left = l, right = r)
}

/** DuckDB `datesub(part, start, end)`: the number of COMPLETE part
  * units between start and end (signed, truncated toward zero) —
  * distinct from `date_diff`, which counts boundary CROSSINGS.
  * Time-based parts divide the exact microsecond delta; month-based
  * parts count full calendar months with the day/time-of-day
  * adjustment (the same borrow rule as age()), then divide. Niche
  * shim scalar — eval-only, builder casts both operands to TIMESTAMP.
  */
case class DateSubParts(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "datesub"

  override protected def nullSafeEval(partAny: Any, startAny: Any, endAny: Any): Any = {
    val part = partAny.toString.toLowerCase.stripSuffix("s")
    val startUs = startAny.asInstanceOf[Long]
    val endUs = endAny.asInstanceOf[Long]
    val micros = endUs - startUs
    def completeMonths: Long = {
      val neg = endUs < startUs
      val (aUs, bUs) = if (neg) (startUs, endUs) else (endUs, startUs)
      import java.time.{LocalDateTime, ZoneOffset}
      def ldt(us: Long) = LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      val a = ldt(aUs); val b = ldt(bUs)
      var m = (a.getYear - b.getYear) * 12L + (a.getMonthValue - b.getMonthValue)
      // incomplete final month: end's (day, time-of-day) before start's
      if (a.getDayOfMonth < b.getDayOfMonth ||
          (a.getDayOfMonth == b.getDayOfMonth &&
            a.toLocalTime.toNanoOfDay < b.toLocalTime.toNanoOfDay)) m -= 1
      if (neg) -m else m
    }
    part match {
      case "microsecond" | "us" => micros
      case "millisecond" | "ms" => micros / 1000L
      case "second" => micros / 1000000L
      case "minute" => micros / 60000000L
      case "hour" => micros / 3600000000L
      case "day" => micros / 86400000000L
      case "week" => micros / (7L * 86400000000L)
      case "month" => completeMonths
      case "quarter" => completeMonths / 3L
      case "year" => completeMonths / 12L
      case "decade" => completeMonths / 120L
      case "century" => completeMonths / 1200L
      case "millennium" => completeMonths / 12000L
      case other => throw new IllegalArgumentException(
        s"datesub: unsupported part '$other'")
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): DateSubParts =
    copy(first = f, second = s, third = t)
}
