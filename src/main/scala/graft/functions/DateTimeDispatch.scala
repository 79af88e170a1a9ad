package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `date_diff(unit, start, end)`: counts UNIT BOUNDARIES
  * crossed, not elapsed units (verified: month Jan31→Mar01 = 2,
  * hour 10:59:59→11:00:01 = 1, day 23:59:59→00:00:01 = 1). Spark's
  * date_diff/timestampdiff count complete units elapsed — a plain
  * alias would silently shift every near-boundary result, so the
  * shim emits this composition over the truncated endpoints.
  * Result is BIGINT like DuckDB's.
  */
case class BoundaryDateDiff(unit: String, start: Expression, end: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override def left: Expression = start
  override def right: Expression = end

  // the replacement is built after analysis, so timezone-aware nodes
  // (date↔timestamp casts, timestamp trunc) need the session zone set
  // explicitly — the resolver never visits them
  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  private def asDate(e: Expression) = Cast(e, DateType, tz)
  private def asTs(e: Expression) = Cast(e, TimestampType, tz)
  private def i64(e: Expression) = Cast(e, LongType)

  private def calendarIndex(e: Expression, unitsPerYear: Int, part: Expression => Expression): Expression =
    Add(Multiply(i64(Year(asDate(e))), Literal(unitsPerYear.toLong)),
      i64(part(asDate(e))))

  private def truncDiffMicros(fmt: String, widthUs: Long): Expression = {
    def t(e: Expression) =
      UnixMicros(TruncTimestamp(Literal(UTF8String.fromString(fmt), StringType), asTs(e), tz))
    IntegralDivide(Subtract(t(end), t(start)), Literal(widthUs))
  }

  override lazy val replacement: Expression = {
    BoundaryDateDiff.normalize(unit) match {
      case "year" => Subtract(i64(Year(asDate(end))), i64(Year(asDate(start))))
      case "quarter" =>
        Subtract(calendarIndex(end, 4, Quarter), calendarIndex(start, 4, Quarter))
      case "month" =>
        Subtract(calendarIndex(end, 12, Month), calendarIndex(start, 12, Month))
      case "week" =>
        // ISO weeks: Spark trunc(date, 'week') is Monday, like DuckDB —
        // but DuckDB's crossing count is wI(end) - wI(start) where
        // wI(d) = epochDays(truncMonday(d)) / 7 under TRUNC-toward-zero
        // division (fuzz v6, verified): because the epoch is a
        // Thursday, Monday-truncated days are ≡ 4 (mod 7), and the
        // truncation merges the two Monday-weeks straddling the epoch
        // (days -3 and +4 both index 0) — date_diff('week',
        // '1969-12-29', '1970-01-05') is 0 there, and every
        // epoch-spanning pair is one less than the plain
        // Monday-crossing count. A subtract-then-divide formula missed
        // exactly those pairs.
        def wI(e: Expression) = IntegralDivide(
          i64(UnixDate(TruncDate(asDate(e),
            Literal(UTF8String.fromString("week"), StringType)))),
          Literal(7L))
        Subtract(wI(end), wI(start))
      case "day" => i64(DateDiff(asDate(end), asDate(start)))
      case "hour" => truncDiffMicros("hour", 3600000000L)
      case "minute" => truncDiffMicros("minute", 60000000L)
      case "second" => truncDiffMicros("second", 1000000L)
      case "millisecond" => truncDiffMicros("millisecond", 1000L)
      case "microsecond" => truncDiffMicros("microsecond", 1L)
      case other => throw new IllegalArgumentException(
        s"date_diff: unsupported unit '$other'")
    }
  }

  override def prettyName: String = "date_diff"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundaryDateDiff =
    copy(start = newLeft, end = newRight)
}

object BoundaryDateDiff {
  /** DuckDB's unit spellings: singular, plural, and the common
    * abbreviations; anything else fails loudly.
    */
  def normalize(raw: String): String =
    raw.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "year" | "years" | "y" | "yr" | "yrs" => "year"
      case "quarter" | "quarters" => "quarter"
      case "month" | "months" | "mon" | "mons" => "month"
      case "week" | "weeks" | "wk" | "weekday" => "week"
      case "day" | "days" | "d" | "dayofmonth" => "day"
      case "hour" | "hours" | "h" | "hr" | "hrs" => "hour"
      case "minute" | "minutes" | "min" | "mins" => "minute"
      case "second" | "seconds" | "s" | "sec" | "secs" => "second"
      case "millisecond" | "milliseconds" | "ms" | "msec" | "millis" => "millisecond"
      case "microsecond" | "microseconds" | "us" | "usec" | "micros" => "microsecond"
      case other => other
    }
}

/** DuckDB's `time_bucket(width, ts[, origin])`: floors to fixed-width
  * buckets aligned to 2000-01-03 00:00:00 (a Monday, so week buckets
  * are ISO-aligned) for micros widths, or to 2000-01-01 for
  * month-component widths (all verified). DATE input yields DATE out.
  */
case class TimeBucket(width: Expression, input: Expression, bucketOrigin: Option[Expression])
    extends Expression with RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(width, input) ++ bucketOrigin.toSeq
  override def nullable: Boolean = true

  // micros since epoch of 2000-01-03 00:00:00 UTC
  private val defaultOriginUs = 946857600000000L

  private def widthParts: (Int, Long) = {
    require(width.foldable, "time_bucket: the bucket width must be an interval literal")
    width.eval(null) match {
      case null => throw new IllegalArgumentException("time_bucket: width is NULL")
      case us: java.lang.Long if width.dataType.isInstanceOf[DayTimeIntervalType] => (0, us)
      case m: java.lang.Integer if width.dataType.isInstanceOf[YearMonthIntervalType] => (m.intValue(), 0L)
      case ci: org.apache.spark.unsafe.types.CalendarInterval =>
        if (ci.months != 0) {
          require(ci.days == 0 && ci.microseconds == 0,
            "time_bucket: mixed month + sub-month widths are unsupported")
          (ci.months, 0L)
        } else (0, ci.days * 86400000000L + ci.microseconds)
      case other => throw new IllegalArgumentException(
        s"time_bucket: expected an interval width, got $other")
    }
  }

  override lazy val replacement: Expression = {
    // post-analysis build: timezone-aware casts need the zone explicit
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val (months, us) = widthParts
    val isDate = input.dataType == DateType
    if (months > 0) {
      require(bucketOrigin.isEmpty, "time_bucket: month widths take no origin argument")
      val d = Cast(input, DateType, tz)
      val idx = Add(Multiply(Subtract(Cast(Year(d), IntegerType), Literal(2000)),
        Literal(12)), Subtract(Month(d), Literal(1)))
      val floored = Subtract(idx, Pmod(idx, Literal(months)))
      val bucket = AddMonths(Literal(10957, DateType) /* 2000-01-01 */, floored)
      if (isDate) bucket else Cast(bucket, input.dataType, tz)
    } else {
      require(us > 0, "time_bucket: width must be positive")
      val o: Expression = bucketOrigin match {
        case Some(e) => UnixMicros(Cast(e, TimestampType, tz))
        case None => Literal(defaultOriginUs)
      }
      val x = UnixMicros(Cast(input, TimestampType, tz))
      val bucket = MicrosToTimestamp(Subtract(x, Pmod(Subtract(x, o), Literal(us))))
      if (isDate) Cast(bucket, DateType, tz) else Cast(bucket, input.dataType, tz)
    }
  }

  override def prettyName: String = "time_bucket"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TimeBucket =
    if (newChildren.length == 3) TimeBucket(newChildren(0), newChildren(1), Some(newChildren(2)))
    else TimeBucket(newChildren(0), newChildren(1), None)
}
