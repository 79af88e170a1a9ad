package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, CreateMap, Expression, MapFromArrays, RuntimeReplaceable}
import org.apache.spark.sql.types.ArrayType

/** DuckDB's two-argument `map` (probe tier 16): map(keys_list,
  * values_list) constructs a map ENTRY-WISE there, while Spark's
  * variadic map(k1, v1) would build a single-entry map of
  * array→array — a silent cardinality divergence. Dispatch on the
  * RESOLVED argument types: two arrays → map_from_arrays (DuckDB's
  * meaning, insertion order preserved), anything else → the
  * single-pair variadic meaning both engines agree on.
  */
case class MapDispatch(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (_: ArrayType, _: ArrayType) => MapFromArrays(left, right)
    case _ => CreateMap(Seq(left, right))
  }

  override def prettyName: String = "map"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MapDispatch =
    copy(left = newLeft, right = newRight)
}
