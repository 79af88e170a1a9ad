package graft

import graft.server.Dialect
import graft.sources.CatalogDir
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the dialect rewriter: no false positives on plain
  * SQL, idempotence on its own output, and scanner correctness.
  */
class DialectPropertySpec extends AnyFunSuite {
  import TestSpark._

  // raw-scalacheck sampling (the scalatest bridge artifact is not a dependency)
  private def forSamples[A](gen: Gen[A], n: Int = 100)(check: A => Unit): Unit =
    (1 to n).foreach(_ => gen.sample.foreach(check))

  test("rewrite is the identity on every dialect-surface-free oracle SQL") {
    // the oracle strings are the project's own corpus of real ANSI/DuckDB
    // SQL; ones using DuckDB bracket indexing, struct literals, := or the
    // // integer-division operator OUTSIDE string literals are
    // legitimately rewritten (that IS the shim's job), every other one —
    // including ones with those tokens inside quoted literals — must
    // pass untouched (quote-mask regression coverage)
    SparkEntry.oracleSql
      .filterNot { case (_, sql) =>
        Seq("[", "{", "//", ":=").exists(Dialect.hasUnquoted(sql, _)) }
      .foreach { case (name, sql) =>
        assert(Dialect.rewrite(spark, sql) == sql, s"rewrite altered oracle of $name")
      }
  }

  test("rewrite is idempotent over the ENTIRE oracle corpus") {
    // scanner-correctness safety net across 120+ real SQL texts,
    // including the bracket-using ones
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val once = Dialect.rewrite(spark, sql)
      assert(Dialect.rewrite(spark, once) == once, s"not idempotent on oracle of $name")
    }
  }

  test("rewrite is idempotent on dialect examples") {
    val examples = Seq(
      "SELECT * EXCLUDE (b) FROM VALUES (1, 2) t(a, b)",
      """SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t QUALIFY rn = 1 ORDER BY a LIMIT 3""",
      "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v",
      "SELECT count(*) FROM t")
    examples.foreach { sql =>
      val once = Dialect.rewrite(spark, sql)
      assert(Dialect.rewrite(spark, once) == once, s"not idempotent: $sql")
    }
  }

  private val plainSql: Gen[String] = for {
    keyword <- Gen.oneOf("SELECT a FROM t", "SELECT x, y FROM u WHERE x > 0")
    lit <- Gen.alphaNumStr
  } yield s"$keyword AND name = '$lit'"

  test("random plain SQL with quoted literals passes through untouched") {
    forSamples(plainSql) { sql =>
      assert(Dialect.rewrite(spark, sql) == sql)
    }
  }

  test("splitStatements: piece count tracks unquoted semicolons") {
    val stmt = Gen.oneOf("SELECT 1", "SELECT 'a;b'", "SELECT \"c;d\" FROM t")
    forSamples(Gen.nonEmptyListOf(stmt)) { stmts =>
      assert(CatalogDir.splitStatements(stmts.mkString(";")) == stmts.map(_.trim))
    }
  }

  test("keywords inside string literals never trigger the QUALIFY rewrite") {
    val sql = "SELECT 'use QUALIFY wisely' AS tip FROM t"
    assert(Dialect.rewrite(spark, sql) == sql)
  }
}
