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
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
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
      }))

  /** Programmatic registration for an already-built session (the
    * extensions config only applies at session construction).
    */
  def injectInto(spark: SparkSession): Unit =
    registrations.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
