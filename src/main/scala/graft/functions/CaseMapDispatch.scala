package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-faithful `upper` / `lower` (reference serving surface:
  * fb64/uquery-rs POST / delegates to DuckDB, src/core/duckdb.rs:87).
  *
  * DuckDB (utf8proc) applies Unicode SIMPLE case mappings per
  * codepoint; Java's String.toUpperCase — what Spark's builtin Upper
  * uses — applies FULL mappings (SpecialCasing.txt), which expand
  * some characters: upper('straße') = 'STRASSE' there vs 'STRAẞE' in
  * DuckDB, upper('ﬁ') = 'FI' vs 'ﬁ', lower('İ') = 'i̇' (two
  * codepoints) vs 'i' — silent value divergences on real
  * international text (probe tier 15).
  *
  * Per-codepoint Character.toUpperCase/toLowerCase reproduces DuckDB
  * exactly across ALL of Unicode except seven codepoints (empirically
  * diffed over the full range, 2026-08-15): ß→ẞ, which utf8proc
  * special-cases, and six Unicode-14 additions (U+A7C7..A7CA,
  * U+A7F5/F6) DuckDB's table predates — a small override switch
  * closes those. Only the dialect registry routes here; the library's
  * own operators keep Spark's builtin upper/lower.
  */
case class CaseMapDispatch(child: Expression, toUpper: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string, got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = if (toUpper) "upper" else "lower"

  override def nullSafeEval(input: Any): Any =
    CaseMapDispatch.mapCase(input.asInstanceOf[UTF8String], toUpper)

  // The helper must NOT be named `map`: the case class inherits
  // TreeNode.map, so Scala emits no static forwarder for a companion
  // `map` and Janino resolves the call against TreeNode.map(Function1)
  // — a compile failure that silently drops the whole projection to
  // interpreted execution. `mapCase` keeps its static forwarder.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CaseMapDispatch.mapCase($c, $toUpper)")

  override protected def withNewChildInternal(newChild: Expression): CaseMapDispatch =
    copy(child = newChild)
}

object CaseMapDispatch {
  /** Unicode simple case mapping with DuckDB's utf8proc deltas. */
  def mapCase(s: UTF8String, toUpper: Boolean): UTF8String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val cp = in.codePointAt(i)
      val mapped =
        if (toUpper) cp match {
          case 0xDF => 0x1E9E // ß → ẞ (utf8proc special case)
          case 0xA7C8 | 0xA7CA | 0xA7F6 => cp // pre-Unicode-14 table
          case _ => Character.toUpperCase(cp)
        } else cp match {
          case 0xA7C7 | 0xA7C9 | 0xA7F5 => cp // pre-Unicode-14 table
          case _ => Character.toLowerCase(cp)
        }
      sb.appendCodePoint(mapped)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
