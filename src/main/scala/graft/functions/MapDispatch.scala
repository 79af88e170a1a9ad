package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayContains, BinaryExpression, CaseWhen, Coalesce, CreateArray, CreateMap, ElementAt, Expression, If, IsNull, Literal, MapContainsKey, MapFromArrays, Or, RuntimeReplaceable, Slice}
import org.apache.spark.sql.types.{ArrayType, BooleanType, MapType, NullType}

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

/** DuckDB's `element_at(map, key)` is map-only and LIST-valued:
  * [value] on a hit (including [NULL] values), [] on a miss and on a
  * NULL map/key — the map_extract shape (measured on the oracle,
  * round-15 grammar v9; the plain Spark builtin returned the bare
  * value). For ARRAY inputs DuckDB raises a binder error; the library
  * query modules use element_at(arr, i) through the same session, so
  * arrays keep Spark's native semantics here (served surface beyond
  * DuckDB's grammar — fuzz class DUCK_ERR, never a silent value
  * divergence).
  */
case class ElementAtDispatch(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = left.dataType match {
    case _: MapType =>
      Slice(
        CreateArray(Seq(ElementAt(left, right, None, failOnError = false))),
        Literal(1),
        If(Coalesce(Seq(MapContainsKey(left, right), Literal(false))),
          Literal(1), Literal(0)))
    case _ => ElementAt(left, right)
  }

  override def prettyName: String = "element_at"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ElementAtDispatch =
    copy(left = newLeft, right = newRight)
}

