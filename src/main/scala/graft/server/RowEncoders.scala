package graft.server

import java.io.OutputStream
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Streaming row encoders for the four response formats
  * (uquery-rs src/web/routers.rs:137-148 delegates these to
  * arrow-csv/arrow-json; here they are hand-rolled over
  * `toLocalIterator`, preserving the bounded-memory streaming
  * property — rows flow driver→socket without materializing the
  * result).
  *
  * JSON/CSV are lossy stringifications exactly like the reference
  * (Arrow IPC is the type-preserving path, ArrowIpcEncoder).
  */
object RowEncoders {

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd HH:mm:ss")

  /** Always emits seconds (LocalDateTime.toString drops :00), plus
    * trimmed fractional micros when present — matching arrow-json/csv.
    */
  private[server] def fmtTimestamp(t: java.sql.Timestamp): String = {
    val ldt = t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
    val base = ldt.format(TsFmt)
    val micros = ldt.getNano / 1000
    if (micros == 0) base
    else base + "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse
  }

  /** DuckDB-parity floating-point rendering (probe-12 catch: Java's
    * Double.toString goes scientific at 1e7 where DuckDB prints plain
    * decimal — every HTTP-served big aggregate diverged). DuckDB's
    * rule set, pinned live: plain decimal (integral values keep one
    * ".0") for 1e-6 <= |v| < 1e21, shortest-digits scientific outside.
    * JSON spells the exponent bare ("1.5e-7", "1e21") and keeps -0.0;
    * VARCHAR/CSV pads it to two digits with a sign ("1.5e-07",
    * "1e+21") and renders -0.0 as "0.0".
    */
  private[server] def fmtFloating(digits: String, forCsv: Boolean): String = {
    val bd = new java.math.BigDecimal(digits)
    val absV = bd.abs.doubleValue
    val neg = digits.startsWith("-")
    if (bd.unscaledValue.signum == 0)
      if (neg && !forCsv) "-0.0" else "0.0"
    else if (absV >= 1e-6 && absV < 1e21) {
      val plain = bd.stripTrailingZeros.toPlainString
      val out = if (plain.contains('.')) plain else plain + ".0"
      if (forCsv && out == "-0.0") "0.0" else out
    } else {
      val stripped = bd.stripTrailingZeros
      val digs = stripped.unscaledValue.abs.toString
      val exp = digs.length - 1 - stripped.scale
      val mant = if (digs.length == 1) digs else digs.head + "." + digs.tail
      val expStr =
        if (forCsv) (if (exp < 0) "e-" else "e+") + f"${math.abs(exp)}%02d"
        else "e" + exp
      (if (neg) "-" else "") + mant + expStr
    }
  }

  /** DuckDB interval rendering (pinned live via to_json: singular /
    * plural year-month-day parts when nonzero, then HH:MM:SS[.ffffff]
    * when the time component is nonzero — or alone when everything is
    * zero; hours unpadded past two digits, fraction trailing-zero
    * trimmed, each component carries its own sign).
    */
  private[server] def fmtInterval(months: Long, days: Long, micros: Long): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val years = months / 12
    val mon = months % 12
    def unit(n: Long, u: String): String = s"$n $u" + (if (math.abs(n) != 1) "s" else "")
    if (years != 0) parts += unit(years, "year")
    if (mon != 0) parts += unit(mon, "month")
    if (days != 0) parts += unit(days, "day")
    if (micros != 0 || parts.isEmpty) {
      val neg = micros < 0
      val am = math.abs(micros)
      val h = am / 3600000000L
      val m = am / 60000000L % 60
      val sec = am / 1000000L % 60
      val us = am % 1000000L
      val frac =
        if (us == 0) ""
        else "." + f"$us%06d".reverse.dropWhile(_ == '0').reverse
      parts += (if (neg) "-" else "") + f"$h%02d:$m%02d:$sec%02d$frac"
    }
    parts.mkString(" ")
  }

  /** Interval-typed values as DuckDB text, whatever object shape the
    * row delivers (CalendarInterval for legacy/calendar results,
    * Period/Duration for ANSI year-month / day-time intervals).
    * Spark folds `INTERVAL 5 DAY` into a pure-micros Duration, so the
    * day component only survives in the COLUMN TYPE — when the field's
    * DayTimeIntervalType starts at DAY, whole days hoist back out
    * ("5 days" like DuckDB) while HOUR-and-finer intervals keep
    * DuckDB's time spelling ("120:00:00" for INTERVAL '120' HOUR).
    */
  private[server] def intervalText(
      v: Any,
      dt: Option[org.apache.spark.sql.types.DataType] = None): Option[String] = v match {
    case ci: org.apache.spark.unsafe.types.CalendarInterval =>
      Some(fmtInterval(ci.months.toLong, ci.days.toLong, ci.microseconds))
    case p: java.time.Period =>
      Some(fmtInterval(p.toTotalMonths, p.getDays.toLong, 0L))
    case d: java.time.Duration =>
      val micros = d.getSeconds * 1000000L + d.getNano / 1000L
      val hoistDays = dt match {
        case Some(it: org.apache.spark.sql.types.DayTimeIntervalType) =>
          it.startField == org.apache.spark.sql.types.DayTimeIntervalType.DAY
        case _ => false
      }
      if (hoistDays)
        Some(fmtInterval(0L, micros / 86400000000L, micros % 86400000000L))
      else Some(fmtInterval(0L, 0L, micros))
    case _ => None
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => Protocol.jsonString(s)
    case b: Boolean => b.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null"
      else fmtFloating(java.lang.Double.toString(d), forCsv = false)
    case f: Float =>
      if (f.isNaN || f.isInfinite) "null"
      else fmtFloating(java.lang.Float.toString(f), forCsv = false)
    case t: java.sql.Timestamp => Protocol.jsonString(fmtTimestamp(t))
    case d: java.sql.Date => Protocol.jsonString(d.toString)
    case b: Array[Byte] => Protocol.jsonString(java.util.Base64.getEncoder.encodeToString(b))
    case seq: scala.collection.Seq[_] => seq.map(jsonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${Protocol.jsonString(String.valueOf(k))}:${jsonValue(x)}" }
        .mkString("{", ",", "}")
    case r: Row =>
      r.schema.fieldNames.zip(r.toSeq)
        .map { case (n, x) => s"${Protocol.jsonString(n)}:${jsonValue(x)}" }
        .mkString("{", ",", "}")
    case n: java.math.BigDecimal => n.toPlainString
    case other => intervalText(other) match {
      case Some(ivl) => Protocol.jsonString(ivl)
      case None => other.toString
    }
  }

  /** jsonValue with the field's declared type available — only the
    * Duration day-hoisting decision consults it (see intervalText).
    */
  private def jsonValueTyped(v: Any, dt: org.apache.spark.sql.types.DataType): String =
    v match {
      case d: java.time.Duration =>
        Protocol.jsonString(intervalText(d, Option(dt)).get)
      case _ => jsonValue(v)
    }

  /** JSON stringification of a nested value (ArrowIpcEncoder's utf8
    * fallback for types without a primitive Arrow mapping).
    */
  private[server] def jsonFallback(v: Any): String = jsonValue(v)

  private def rowJson(names: Array[String], row: Row): String =
    names.indices.map { i =>
      val v =
        if (row.schema != null) jsonValueTyped(row.get(i), row.schema(i).dataType)
        else jsonValue(row.get(i))
      s"${Protocol.jsonString(names(i))}:$v"
    }.mkString("{", ",", "}")

  /** `[{"col":v,...},...]` — arrow-json ArrayWriter shape (golden:
    * uquery-rs src/main.rs:163-166).
    */
  def writeJsonArray(names: Array[String], rows: Iterator[Row], out: OutputStream): Unit = {
    out.write('[')
    var first = true
    rows.foreach { r =>
      if (!first) out.write(',')
      out.write(rowJson(names, r).getBytes(UTF_8))
      first = false
    }
    out.write(']')
  }

  /** One JSON object per line (golden: src/main.rs:393-411). */
  def writeJsonLines(names: Array[String], rows: Iterator[Row], out: OutputStream): Unit =
    rows.foreach { r =>
      out.write(rowJson(names, r).getBytes(UTF_8))
      out.write('\n')
    }

  /** DuckDB's VARCHAR rendering of NESTED values (oracle-measured,
    * round-15 bytes fuzz): lists `[1, NULL, 3]` (", " separator,
    * NULL uppercase, strings bare), structs `{'k': v}` (keys
    * single-quoted, values bare), maps `{k=v}`. Scalars inside reuse
    * the CSV scalar conventions (timestamps, doubles with trailing
    * .0) — this is what the reference's CSV carries for nested
    * columns, since it streams DuckDB's own text conversion.
    */
  private[server] def duckTextValue(v: Any): String = v match {
    case null => "NULL"
    case seq: scala.collection.Seq[_] =>
      seq.map(duckTextValue).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${duckTextValue(k)}=${duckTextValue(x)}" }
        .mkString("{", ", ", "}")
    case r: Row =>
      r.schema.fieldNames.zip(r.toSeq)
        .map { case (n, x) => s"'$n': ${duckTextValue(x)}" }
        .mkString("{", ", ", "}")
    case t: java.sql.Timestamp => fmtTimestamp(t)
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) d.toString
      else fmtFloating(java.lang.Double.toString(d), forCsv = true)
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) f.toString
      else fmtFloating(java.lang.Float.toString(f), forCsv = true)
    case other => intervalText(other, None).getOrElse(other.toString)
  }

  private def csvField(v: Any, dt: Option[org.apache.spark.sql.types.DataType]): String = v match {
    case null => ""
    case t: java.sql.Timestamp => fmtTimestamp(t)
    case s =>
      // nested values render as DuckDB's VARCHAR conversion (round-15
      // bytes fuzz closed the old compact-JSON divergence: the oracle
      // writes `[1, NULL, 3]`, not `[1,null,3]`)
      val str = s match {
        case _: scala.collection.Seq[_] | _: scala.collection.Map[_, _] | _: Row =>
          duckTextValue(s)
        case d: java.lang.Double =>
          if (d.isNaN || d.isInfinite) d.toString
          else fmtFloating(java.lang.Double.toString(d), forCsv = true)
        case f: java.lang.Float =>
          if (f.isNaN || f.isInfinite) f.toString
          else fmtFloating(java.lang.Float.toString(f), forCsv = true)
        case other => intervalText(other, dt).getOrElse(other.toString)
      }
      if (str.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + str.replace("\"", "\"\"") + "\""
      else str
  }

  /** Header row + RFC-4180 quoting (golden: src/main.rs:192). */
  def writeCsv(names: Array[String], rows: Iterator[Row], out: OutputStream): Unit = {
    out.write((names.mkString(",") + "\n").getBytes(UTF_8))
    rows.foreach { r =>
      val line = names.indices.map { i =>
        csvField(r.get(i),
          if (r.schema != null) Some(r.schema(i).dataType) else None)
      }.mkString(",")
      out.write((line + "\n").getBytes(UTF_8))
    }
  }
}
