package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's bracket slice `x[a:b]`, type-faithfully (verified against
  * DuckDB 1.5): 1-based and END-INCLUSIVE on both strings and lists,
  * negative bounds count from the end (-1 = last, inclusive), bound 0
  * is treated as 1, out-of-range bounds clamp, an inverted range
  * yields ''/[], and a NULL operand or bound yields NULL. Spark's
  * `slice` is (start, LENGTH) and `substring` mixes conventions, so
  * the dialect shim emits this dispatching expression; the analyzer
  * swaps in the replacement built from codegen'd builtins.
  */
case class SliceDispatch(child: Expression, from: Expression, to: Expression)
    extends TernaryExpression with RuntimeReplaceable {

  override def first: Expression = child
  override def second: Expression = from
  override def third: Expression = to

  private def i32(e: Expression): Expression = Cast(e, IntegerType)

  // aN = clamp-low(1, negative-from-end(a)); bN = clamp-high(len, ...);
  // width = max(bN - aN + 1, 0) — one shared normalization for both types
  private def bounds(len: Expression): (Expression, Expression) = {
    val a0 = i32(from)
    val b0 = i32(to)
    val aN = Greatest(Seq(Literal(1),
      If(LessThan(a0, Literal(0)), Add(Add(len, a0), Literal(1)), a0)))
    val bN = Least(Seq(len,
      If(LessThan(b0, Literal(0)), Add(Add(len, b0), Literal(1)), b0)))
    (aN, Greatest(Seq(Subtract(Add(bN, Literal(1)), aN), Literal(0))))
  }

  override lazy val replacement: Expression = {
    val anyNull = Or(Or(IsNull(child), IsNull(from)), IsNull(to))
    val nullLit = Literal.create(null, child.dataType)
    child.dataType match {
      case _: StringType =>
        val (aN, width) = bounds(Length(child))
        If(anyNull, nullLit, Substring(child, aN, width))
      case _: ArrayType =>
        val (aN, width) = bounds(Size(child))
        If(anyNull, nullLit, Slice(child, aN, width))
      case other => throw new IllegalArgumentException(
        s"graft_slice: cannot slice a ${other.simpleString(40)} (expected string or list)")
    }
  }

  override def prettyName: String = "graft_slice"

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SliceDispatch =
    copy(child = f, from = s, to = t)
}

/** DuckDB's bracket element access `x[i]`: on strings a ONE-CHARACTER
  * slice ('' when out of range or i = 0, -1 = last); on lists 1-based
  * with NULL at 0 / out-of-range and negative-from-end (Spark's
  * try_element_at semantics plus the 0 edge); on maps the one-element
  * LIST lookup ([value] / [], DuckDB's map_extract shape).
  */
case class AtDispatch(child: Expression, index: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override def left: Expression = child
  override def right: Expression = index

  override lazy val replacement: Expression = child.dataType match {
    case _: StringType =>
      val len = Length(child)
      val i0 = Cast(index, IntegerType)
      val iN = If(LessThan(i0, Literal(0)), Add(Add(len, i0), Literal(1)), i0)
      val empty = Literal.create(UTF8String.fromString(""), child.dataType)
      If(Or(IsNull(child), IsNull(index)),
        Literal.create(null, child.dataType),
        If(LessThanOrEqual(iN, Literal(0)), empty, Substring(child, iN, Literal(1))))
    case ArrayType(et, _) =>
      If(EqualTo(Cast(index, IntegerType), Literal(0)),
        Literal.create(null, et),
        ElementAt(child, Cast(index, IntegerType), None, failOnError = false))
    case MapType(_, _, _) =>
      // DuckDB map[k] yields a ONE-ELEMENT LIST: [value] on a hit
      // (including [NULL] for a NULL value), [] on a miss AND on a
      // NULL map or key — the map_extract shape (measured on the
      // oracle, DuckDB 1.0; round-15 grammar-v9 finding over
      // parquet-read map columns — was a documented bare-value
      // divergence before).
      Slice(
        CreateArray(Seq(ElementAt(child, index, None, failOnError = false))),
        Literal(1),
        If(Coalesce(Seq(MapContainsKey(child, index), Literal(false))),
          Literal(1), Literal(0)))
    case _: StructType =>
      // struct['field'] — DuckDB's bracket spelling of struct_extract
      ExtractValue(child, index,
        org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution)
    case other => throw new IllegalArgumentException(
      s"graft_at: cannot subscript a ${other.catalogString} (expected string, list, map or struct)")
  }

  override def prettyName: String = "graft_at"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AtDispatch =
    copy(child = newLeft, index = newRight)
}
