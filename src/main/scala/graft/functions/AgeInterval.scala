package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{CalendarIntervalType, DataType}
import org.apache.spark.unsafe.types.CalendarInterval

/** DuckDB/Postgres `age(end, start)`: the SYMBOLIC calendar difference
  * — years/months/days/time computed field-wise with borrowing, not a
  * flat microsecond delta (DuckDB docs: date part functions; verified
  * there: age(TIMESTAMP '2024-03-05', TIMESTAMP '2020-01-01') =
  * 4 years 2 months 4 days, and age(a, b) = -age(b, a)).
  *
  * Borrow rules follow the published Postgres `timestamp_age`
  * algorithm DuckDB mirrors: negative time-of-day borrows a day;
  * negative days borrow the length of the START timestamp's month;
  * negative months borrow a year. The negative-overall case is the
  * exact negation of the swapped call (both engines render
  * '-4 years -2 months ...'). Returns a CalendarInterval, so the
  * result adds to timestamps and renders like DuckDB's INTERVAL.
  *
  * Niche shim-layer scalar (never in a library hot path) — eval-only.
  */
case class AgeInterval(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  // inputs arrive as TIMESTAMP: the registry builder casts both args
  // (AbstractDataType is private[sql], so ExpectsInputTypes is not
  // available outside Spark's own package)
  override def dataType: DataType = CalendarIntervalType
  override def prettyName: String = "age"

  override protected def nullSafeEval(endAny: Any, startAny: Any): Any = {
    val endUs = endAny.asInstanceOf[Long]
    val startUs = startAny.asInstanceOf[Long]
    val neg = endUs < startUs
    val (aUs, bUs) = if (neg) (startUs, endUs) else (endUs, startUs)
    import java.time.{LocalDateTime, YearMonth, ZoneOffset}
    def ldt(us: Long): LocalDateTime = LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    val a = ldt(aUs)
    val b = ldt(bUs)
    var micros = (a.toLocalTime.toNanoOfDay - b.toLocalTime.toNanoOfDay) / 1000L
    var days = a.getDayOfMonth - b.getDayOfMonth
    var months = a.getMonthValue - b.getMonthValue
    var years = a.getYear - b.getYear
    if (micros < 0) { micros += 86400000000L; days -= 1 }
    while (days < 0) {
      days += YearMonth.of(b.getYear, b.getMonthValue).lengthOfMonth()
      months -= 1
    }
    while (months < 0) { months += 12; years -= 1 }
    val totalMonths = years * 12 + months
    if (neg) new CalendarInterval(-totalMonths, -days, -micros)
    else new CalendarInterval(totalMonths, days, micros)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AgeInterval =
    copy(left = newLeft, right = newRight)
}
