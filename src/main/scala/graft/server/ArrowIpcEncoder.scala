package graft.server

import java.io.OutputStream
import scala.jdk.CollectionConverters._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Arrow IPC stream encoder (uquery-rs src/web/consumers.rs:47-75:
  * schema message lazily on first batch, then RecordBatches).
  *
  * Built on the public arrow-vector API over `toLocalIterator` — the
  * type-preserving response path. Scalar Spark types map 1:1; nested
  * types fall back to their JSON stringification as utf8 (same lossy
  * down-convert the reference applies on its JSON/CSV paths).
  */
object ArrowIpcEncoder {

  private val BatchRows = 1024

  private def arrowField(f: StructField): Field = {
    def primitive(t: ArrowType): Field =
      new Field(f.name, new FieldType(f.nullable, t, null), null)
    f.dataType match {
      case IntegerType => primitive(new ArrowType.Int(32, true))
      case LongType => primitive(new ArrowType.Int(64, true))
      case ShortType => primitive(new ArrowType.Int(16, true))
      case ByteType => primitive(new ArrowType.Int(8, true))
      case DoubleType => primitive(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
      case FloatType => primitive(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
      case BooleanType => primitive(ArrowType.Bool.INSTANCE)
      case TimestampType => primitive(new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC"))
      case DateType => primitive(new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY))
      case BinaryType => primitive(ArrowType.Binary.INSTANCE)
      case d: DecimalType => primitive(new ArrowType.Decimal(d.precision, d.scale, 128))
      case _ => primitive(ArrowType.Utf8.INSTANCE) // strings + nested fallback
    }
  }

  private def setValue(vec: FieldVector, i: Int, v: Any, dt: DataType): Unit = (vec, v) match {
    case (x: IntVector, n: Int) => x.setSafe(i, n)
    case (x: BigIntVector, n: Long) => x.setSafe(i, n)
    case (x: SmallIntVector, n: Short) => x.setSafe(i, n)
    case (x: TinyIntVector, n: Byte) => x.setSafe(i, n)
    case (x: Float8Vector, n: Double) => x.setSafe(i, n)
    case (x: Float4Vector, n: Float) => x.setSafe(i, n)
    case (x: BitVector, b: Boolean) => x.setSafe(i, if (b) 1 else 0)
    case (x: TimeStampMicroTZVector, t: java.sql.Timestamp) =>
      x.setSafe(i, Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case (x: DateDayVector, d: java.sql.Date) =>
      x.setSafe(i, d.toLocalDate.toEpochDay.toInt)
    case (x: VarBinaryVector, b: Array[Byte]) => x.setSafe(i, b)
    case (x: DecimalVector, d: java.math.BigDecimal) =>
      x.setSafe(i, d.setScale(x.getScale))
    case (x: VarCharVector, s) =>
      val str = s match {
        case st: String => st
        // nested fallback: JSON stringification, not Scala toString
        case seq: scala.collection.Seq[_] => RowEncoders.jsonFallback(seq)
        case m: scala.collection.Map[_, _] => RowEncoders.jsonFallback(m)
        case r: Row => RowEncoders.jsonFallback(r)
        case other => String.valueOf(other)
      }
      x.setSafe(i, str.getBytes("UTF-8"))
    case _ => vec.setNull(i)
  }

  def write(schema: StructType, rows: Iterator[Row], out: OutputStream): Unit = {
    val allocator = new RootAllocator(Long.MaxValue)
    try {
      val arrowSchema = new ArrowSchema(schema.fields.map(arrowField).toSeq.asJava)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      try {
        val writer = new ArrowStreamWriter(root, null, out)
        writer.start()
        while (rows.hasNext) {
          root.allocateNew()
          var n = 0
          while (rows.hasNext && n < BatchRows) {
            val row = rows.next()
            schema.fields.zipWithIndex.foreach { case (f, c) =>
              val vec = root.getVector(c)
              val v = row.get(c)
              if (v == null) vec.setNull(n) else setValue(vec, n, v, f.dataType)
            }
            n += 1
          }
          root.setRowCount(n)
          writer.writeBatch()
        }
        writer.end()
      } finally root.close()
    } finally allocator.close()
  }
}
