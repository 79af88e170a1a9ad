package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, MillisToTimestamp, RuntimeReplaceable, UnaryExpression, UnixMillis}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** DuckDB's `epoch_ms` is overloaded on argument type (duckdb docs:
  * timestamp functions):
  *
  *   - `epoch_ms(BIGINT)`    → TIMESTAMP at that many ms since epoch
  *   - `epoch_ms(TIMESTAMP)` → BIGINT ms since epoch
  *
  * Spark splits these into `timestamp_millis` / `unix_millis`; this
  * expression restores the overload by dispatching on the RESOLVED
  * child type — the analyzer swaps in the replacement, so codegen and
  * execution are exactly the underlying builtin's.
  */
case class EpochMsDispatch(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => MillisToTimestamp(child)
    case _ => UnixMillis(child)
  }

  override def prettyName: String = "epoch_ms"

  override protected def withNewChildInternal(newChild: Expression): EpochMsDispatch =
    copy(child = newChild)
}
