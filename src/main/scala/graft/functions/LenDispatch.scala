package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Length, RuntimeReplaceable, Size, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, MapType}

/** DuckDB's `len` dispatches on argument type (duckdb docs: text /
  * list functions): characters for strings, cardinality for lists.
  * Spark splits these into `length` / `size`; this expression restores
  * the overload by dispatching on the RESOLVED child type — the
  * analyzer swaps in the replacement, so codegen and execution are
  * exactly the underlying builtin's (size(NULL) is NULL on Spark 4's
  * defaults, matching DuckDB's len(NULL)).
  */
case class LenDispatch(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child)
    case _ => Length(child)
  }

  override def prettyName: String = "len"

  override protected def withNewChildInternal(newChild: Expression): LenDispatch =
    copy(child = newChild)
}
