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
  * type-preserving response path. Scalar Spark types map 1:1;
  * LIST-of-scalar columns stream as native Arrow list vectors
  * (round-15 bytes fuzz — the reference streams DuckDB's own arrow,
  * where lists are real list types); deeper nesting (struct / map /
  * list-of-list) falls back to JSON stringification as utf8.
  */
object ArrowIpcEncoder {

  private val BatchRows = 1024

  /** Scalar Spark type → Arrow type; None for types with no scalar
    * Arrow mapping here (struct/map/nested lists → utf8 fallback). */
  private def scalarArrow(dt: DataType): Option[ArrowType] = dt match {
    case IntegerType => Some(new ArrowType.Int(32, true))
    case LongType => Some(new ArrowType.Int(64, true))
    case ShortType => Some(new ArrowType.Int(16, true))
    case ByteType => Some(new ArrowType.Int(8, true))
    case DoubleType => Some(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
    case FloatType => Some(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
    case BooleanType => Some(ArrowType.Bool.INSTANCE)
    case TimestampType => Some(new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC"))
    case DateType => Some(new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY))
    case BinaryType => Some(ArrowType.Binary.INSTANCE)
    case d: DecimalType => Some(new ArrowType.Decimal(d.precision, d.scale, 128))
    case StringType => Some(ArrowType.Utf8.INSTANCE)
    // untyped-NULL elements ([], [x + NULL, ...]): every element is
    // null, so the child type is arbitrary — utf8 keeps the list
    // NATIVE (values [null,…]/[] either way) instead of stringifying
    // the whole column (round-15 bytes fuzz, the last arrow class)
    case NullType => Some(ArrowType.Utf8.INSTANCE)
    case _ => None
  }

  private def arrowField(f: StructField): Field = {
    def primitive(t: ArrowType): Field =
      new Field(f.name, new FieldType(f.nullable, t, null), null)
    f.dataType match {
      // round-15 (bytes fuzz): LIST-of-scalar columns stream as NATIVE
      // Arrow lists — the reference streams DuckDB's own arrow, where
      // lists are real list vectors, so the old utf8 stringification
      // was a type-fidelity gap on the arrow path. Nested-of-nested /
      // struct / map keep the documented utf8 fallback.
      case ArrayType(et, containsNull) if scalarArrow(et).isDefined =>
        val child = new Field("item",
          new FieldType(containsNull, scalarArrow(et).get, null), null)
        new Field(f.name, new FieldType(f.nullable, ArrowType.List.INSTANCE, null),
          java.util.List.of(child))
      case other => scalarArrow(other) match {
        case Some(t) => primitive(t)
        case None => primitive(ArrowType.Utf8.INSTANCE) // nested fallback
      }
    }
  }

  private def setValue(vec: FieldVector, i: Int, v: Any, dt: DataType): Unit = (vec, v) match {
    case (x: complex.ListVector, seq: scala.collection.Seq[_]) =>
      val et = dt.asInstanceOf[ArrayType].elementType
      val start = x.startNewValue(i)
      val child = x.getDataVector
      var j = 0
      seq.foreach { e =>
        if (e == null) child.setNull(start + j)
        else setValue(child, start + j, e, et)
        j += 1
      }
      x.endValue(i, j)
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
