package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Capturing-group count of a regex pattern, evaluated per row with a
  * last-pattern cache (the same compile-on-change scheme Spark's own
  * RegExpExtractBase uses for non-constant patterns).
  *
  * Exists only to reproduce DuckDB's group-overflow behaviors when the
  * PATTERN is not foldable (round-13 ADVICE item: the literal-pattern
  * build-time checks in GraftExtensions cannot see a per-row pattern):
  * regexp_extract with a group index beyond the pattern's count returns
  * '' there, and regexp_replace with an overflowing backreference in
  * the rewrite returns the input unchanged — both per row, verified
  * 2026-08-16. Foldable patterns never reach this expression, so the
  * CodegenFallback cost only applies to the rare column-held-pattern
  * shape (which already pays a per-row compile in the regex builtin
  * itself).
  */
case class RegexGroupCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private var lastPattern: String = _
  @transient private var lastCount: Int = _

  override def nullSafeEval(p: Any): Any = {
    val s = p.toString
    if (!s.equals(lastPattern)) {
      lastCount = java.util.regex.Pattern.compile(s).matcher("").groupCount()
      lastPattern = s
    }
    lastCount
  }

  override def prettyName: String = "graft_regex_group_count"

  override protected def withNewChildInternal(newChild: Expression): RegexGroupCount =
    copy(child = newChild)
}
