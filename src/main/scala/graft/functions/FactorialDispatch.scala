package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Factorial, GreaterThan, If, LessThan, Literal, RaiseError, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** DuckDB's `factorial(n)` / postfix `n!`, type-faithfully (every rule
  * verified against DuckDB 1.5 — the round-9 advice assumed `21!`
  * errors and `!` binds tighter than `^`; actual DuckDB does neither):
  *
  *   - accepts INTEGER-or-narrower ONLY: `factorial(CAST(3 AS
  *     BIGINT))` and `factorial(2.5)` are binder errors in DuckDB, so
  *     a non-integer operand throws at analysis here too (this is what
  *     makes `2^3!` fail loudly on both engines: both parse it as
  *     `(2^3)!`, and the DOUBLE operand is the binder error);
  *   - NULL → NULL;
  *   - n < 0 → 1 (DuckDB: `(-5)!` = 1, not an error);
  *   - 0 ≤ n ≤ 20 → the exact value (fits BIGINT on both engines);
  *   - n > 20 → raise: DuckDB returns a HUGEINT (21! … 33!) or its own
  *     Out of Range error (≥ 34!); Spark has no 128-bit integer, and
  *     its builtin factorial would silently yield NULL — the one
  *     documented divergence is a loud error instead of DuckDB's
  *     HUGEINT value (COVERAGE.md divergence table).
  */
case class FactorialDispatch(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case ByteType | ShortType | IntegerType =>
      val n = Cast(child, IntegerType)
      If(LessThan(n, Literal(0)), Literal(1L),
        If(GreaterThan(n, Literal(20)),
          Cast(new RaiseError(Literal(
            "factorial: result exceeds BIGINT for n > 20 " +
              "(DuckDB returns HUGEINT up to 33!, out-of-range beyond)")),
            LongType),
          Factorial(n)))
    case other =>
      // DuckDB: Binder Error: No function matches 'factorial(<type>)'
      throw new IllegalArgumentException(
        s"factorial: no overload for argument type ${other.simpleString(40)} " +
          "(DuckDB accepts INTEGER or narrower only)")
  }

  override def prettyName: String = "factorial"

  override protected def withNewChildInternal(newChild: Expression): FactorialDispatch =
    copy(child = newChild)
}
