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

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => Protocol.jsonString(s)
    case b: Boolean => b.toString
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => if (f.isNaN || f.isInfinite) "null" else f.toString
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
    case other => other.toString
  }

  /** JSON stringification of a nested value (ArrowIpcEncoder's utf8
    * fallback for types without a primitive Arrow mapping).
    */
  private[server] def jsonFallback(v: Any): String = jsonValue(v)

  private def rowJson(names: Array[String], row: Row): String =
    names.indices.map { i =>
      s"${Protocol.jsonString(names(i))}:${jsonValue(row.get(i))}"
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

  private def csvField(v: Any): String = v match {
    case null => ""
    case t: java.sql.Timestamp => fmtTimestamp(t)
    case s =>
      // nested values stringify as JSON, agreeing with the JSON and
      // Arrow-utf8-fallback paths (not Scala's "WrappedArray(...)")
      val str = s match {
        case _: scala.collection.Seq[_] | _: scala.collection.Map[_, _] | _: Row =>
          jsonFallback(s)
        case other => other.toString
      }
      if (str.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + str.replace("\"", "\"\"") + "\""
      else str
  }

  /** Header row + RFC-4180 quoting (golden: src/main.rs:192). */
  def writeCsv(names: Array[String], rows: Iterator[Row], out: OutputStream): Unit = {
    out.write((names.mkString(",") + "\n").getBytes(UTF_8))
    rows.foreach { r =>
      val line = names.indices.map(i => csvField(r.get(i))).mkString(",")
      out.write((line + "\n").getBytes(UTF_8))
    }
  }
}
