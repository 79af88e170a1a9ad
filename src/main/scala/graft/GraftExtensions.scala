package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, SimHash64}

/** SparkSessionExtensions entry point: registers the library's native
  * codegen'd kernels in the SQL function registry, so a SQL-only
  * client (the reference's sole API is SQL text over POST /,
  * uquery-rs src/web/request.rs) can call them directly:
  *
  *   spark.sql.extensions=graft.GraftExtensions   // or injectInto(spark)
  *   SELECT cosine_sim(embedding, query_vec), simhash64(token_hashes) ...
  *
  * This is preference tier (b) of the custom-operator ladder (builder
  * brief): a Catalyst `Expression` with `doGenCode`, reachable from
  * both the Column API and SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.allRegistrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors (fused codegen loop)."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args(1))
      }),
    ("simhash64",
      info("simhash64", "simhash64(hashes) - 64-bit SimHash signature from an array of token hashes."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"simhash64 expects 1 argument, got ${args.length}")
        SimHash64(args.head)
      }),
    // NOT a plain alias: DuckDB's epoch_ms is overloaded by argument
    // type — BIGINT ms → TIMESTAMP, TIMESTAMP → BIGINT ms. A plain
    // alias onto unix_millis lost the first overload; this dispatches
    // on the resolved child type like DuckDB's own overload resolution.
    // the dialect shim's rendering of DuckDB's `//` operator: integer
    // division on integral operands, plain division otherwise
    // (IntDivDispatch doc has the verified semantics)
    ("graft_intdiv",
      info("graft_intdiv", "graft_intdiv(a, b) - DuckDB's // operator: integral div on integers, plain division otherwise."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_intdiv expects 2 arguments, got ${args.length}")
        graft.functions.IntDivDispatch(args.head, args(1))
      }),
    ("epoch_ms",
      info("epoch_ms", "epoch_ms(x) - BIGINT ms->TIMESTAMP or TIMESTAMP->BIGINT ms (DuckDB's overloads)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"epoch_ms expects 1 argument, got ${args.length}")
        graft.functions.EpochMsDispatch(args.head)
      }),
    // NOT a plain alias: DuckDB's list_distinct also drops NULL
    // elements, Spark's array_distinct keeps one — compose the null
    // filter explicitly so the alias matches DuckDB bit-for-bit.
    ("list_distinct",
      info("list_distinct", "list_distinct(arr) - distinct non-NULL elements (DuckDB semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"list_distinct expects 1 argument, got ${args.length}")
        import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayFilter, IsNotNull, LambdaFunction, UnresolvedNamedLambdaVariable}
        val v = UnresolvedNamedLambdaVariable(Seq("__ld_x"))
        ArrayDistinct(ArrayFilter(args.head, LambdaFunction(IsNotNull(v), Seq(v))))
      }))

  /** DuckDB function-name aliases onto Spark builtins with matching
    * semantics AND argument order — the function-level face of the
    * dialect shim (`server.Dialect` handles the syntax-level sugar).
    * Only same-semantics pairs are aliased; names whose DuckDB
    * behavior differs (string_split literal-vs-regex, len's
    * type-dispatch, strftime's %-patterns, list_prepend's reversed
    * argument order, engine hash values) are deliberately NOT
    * mapped — a silently-different result is worse than an
    * unknown-function error.
    */
  private[graft] val duckAliases: Seq[(String, String)] = Seq(
    "list_transform" -> "transform",
    "list_filter" -> "filter",
    "list_sort" -> "array_sort",
    "list_contains" -> "array_contains",
    // list_append/list_concat deliberately NOT aliased: DuckDB skips
    // NULL list inputs (list_append(NULL, 3) = [3]) where Spark's
    // array_append/concat return NULL — the silent-divergence class
    // this table's policy forbids
    "list_value" -> "array",
    "arg_max" -> "max_by",
    "arg_min" -> "min_by",
    "quantile_cont" -> "percentile",
    "regexp_matches" -> "rlike")

  private def aliasRegistrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = {
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    duckAliases.flatMap { case (alias, target) =>
      builtin.lookupFunctionBuilder(FunctionIdentifier(target)).map { b =>
        (alias, info(alias, s"$alias(...) - DuckDB-dialect alias of $target."), b)
      }
    }
  }

  private[graft] def allRegistrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    registrations ++ aliasRegistrations

  /** Programmatic registration for an already-built session (the
    * extensions config only applies at session construction).
    */
  def injectInto(spark: SparkSession): Unit =
    allRegistrations.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
