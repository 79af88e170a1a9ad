package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, CaseWhen, Cast, ElementAt, EqualTo, Expression, Literal, RuntimeReplaceable, Substring, TryElementAt, TryEval}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** DuckDB's `array_extract` / `list_element` / `list_extract`
  * dispatches on argument type (duckdb docs: list functions): element
  * lookup for lists, single-character extraction for strings. Index
  * semantics pinned against DuckDB 1.x:
  *   - lists: 1-based, negative counts from the end, index 0 and
  *     out-of-bounds → NULL (Spark's try_element_at, with the idx=0
  *     case guarded — ANSI element_at raises there);
  *   - strings: 1-based, negative from the end, index 0 and
  *     out-of-bounds → '' (empty string, NOT NULL — substring already
  *     does this for every case except 0, which Spark treats as 1).
  * RuntimeReplaceable: the analyzer swaps in the underlying builtin,
  * so codegen and execution are the builtin's own.
  */
case class ArrayExtractDispatch(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = left.dataType match {
    case _: ArrayType =>
      CaseWhen(Seq((EqualTo(right, Literal(0)),
        Literal.create(null, left.dataType.asInstanceOf[ArrayType].elementType))),
        Some(TryEval(ElementAt(left, right, failOnError = false))))
    case _ =>
      CaseWhen(Seq((EqualTo(right, Literal(0)), Literal(""))),
        Some(Substring(Cast(left, StringType), Cast(right, IntegerType), Literal(1))))
  }

  override def prettyName: String = "array_extract"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayExtractDispatch =
    copy(left = newLeft, right = newRight)
}
