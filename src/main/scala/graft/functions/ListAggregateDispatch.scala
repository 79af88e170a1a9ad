package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, ArrayFilter, ArrayMax, ArrayMin, BinaryExpression, Cast, Divide, Expression, If, IsNotNull, IsNull, LambdaFunction, Literal, NamedLambdaVariable, RuntimeReplaceable, Size}
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, FloatType, LongType}

/** DuckDB's `list_aggregate(list, 'fn')` for the scalar-reducible
  * function names (list functions doc), with the standalone
  * `list_sum` / `list_avg` / `list_min` / `list_max` shorthands built
  * on the same dispatch. DuckDB semantics, verified against 1.x:
  * NULL elements are skipped, an empty (or all-NULL) list sums/avgs
  * to NULL, `count` counts non-NULL elements ([] → 0), and a NULL
  * list always yields NULL. The replacement is composed from Spark's
  * codegen'd higher-order builtins (filter / aggregate / array_min /
  * array_max / size) once the list's element type is RESOLVED — that
  * is what picks the right zero literal for the fold.
  */
case class ListAggregateDispatch(list: Expression, fname: Expression)
    extends BinaryExpression with RuntimeReplaceable {

  override def left: Expression = list
  override def right: Expression = fname

  private lazy val fn: String = {
    require(fname.foldable, "list_aggregate: the function name must be a literal")
    val v = fname.eval(null)
    require(v != null, "list_aggregate: the function name is NULL")
    v.toString.toLowerCase
  }

  override lazy val replacement: Expression = {
    val at = list.dataType.asInstanceOf[ArrayType]
    val elem = at.elementType
    // RESOLVED lambda variables (the ArrayCompact pattern): a
    // RuntimeReplaceable reports resolved as soon as its children are,
    // so the analyzer never gets a chance to bind unresolved lambdas
    // inside the replacement — they must be typed up front
    val fv = NamedLambdaVariable("__la_x", elem, at.containsNull)
    val nonNull = ArrayFilter(list, LambdaFunction(IsNotNull(fv), Seq(fv)))
    // fold with a NULL seed: the first element replaces the seed, so an
    // empty (or all-NULL, or NULL) list stays NULL exactly like DuckDB
    def sumExpr: Expression = {
      val accType = elem match {
        case DoubleType | FloatType => DoubleType
        // precision 38 is type-stable under Add (38 + 38 caps at 38),
        // which ArrayAggregate requires of its merge function
        case d: DecimalType => DecimalType(38, d.scale)
        case _ => LongType
      }
      val zero: Expression = Literal.create(null, accType)
      val acc = NamedLambdaVariable("__la_acc", accType, nullable = true)
      val x = NamedLambdaVariable("__la_e", elem, nullable = false)
      val fin = NamedLambdaVariable("__la_f", accType, nullable = true)
      ArrayAggregate(nonNull, zero,
        LambdaFunction(
          If(IsNull(acc), Cast(x, accType), Add(acc, Cast(x, accType))), Seq(acc, x)),
        LambdaFunction(fin, Seq(fin)))
    }
    fn match {
      case "min" => ArrayMin(list)
      case "max" => ArrayMax(list)
      case "count" => Size(nonNull) // Size(NULL) = NULL, matching DuckDB
      case "sum" => sumExpr
      case "avg" | "mean" =>
        // NULL sum (no non-NULL elements) propagates through the division
        Divide(Cast(sumExpr, DoubleType), Cast(Size(nonNull), DoubleType))
      case other => throw new IllegalArgumentException(
        s"list_aggregate: unsupported function '$other' (supported: min, max, count, sum, avg)")
    }
  }

  override def prettyName: String = "list_aggregate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ListAggregateDispatch =
    copy(list = newLeft, fname = newRight)
}
