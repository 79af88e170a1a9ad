package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.FuzzProbe

/** Round-14 verdict ask #7: the fuzz sweeps become a STANDING gate
  * instead of a per-round manual run.
  *
  * Two sweeps, both inside `sbt test`:
  *
  *  1. GOLDEN sweep — 600 grammar queries at a fixed seed, compared
  *     line-for-line against a committed snapshot that fuzz_check.py
  *     verified against DuckDB at generation time (see the snapshot's
  *     header comment in COVERAGE.md). Any value/error drift on a
  *     grammar-covered plane fails here, CI-style, naming the query.
  *     After an INTENDED semantics change: regenerate via
  *     `runMain graft.tools.FuzzProbe /tmp/golden.jsonl 600 1400`,
  *     re-verify with fuzz_check.py, and commit the new snapshot.
  *
  *  2. FRESH sweep — 400 queries at a seed derived from the current
  *     commit hash (new commit = new seed, so coverage accumulates
  *     across rounds), asserting the serving path never CRASHES:
  *     parse errors and rewriter blow-ups (MatchError, NPE, index
  *     out of bounds, StackOverflow) on generated DuckDB-grammar text
  *     are rewrite bugs by definition — every loud failure must be a
  *     controlled AnalysisException/IllegalArgument/Arithmetic class.
  */
class FuzzRegressionSpec extends AnyFunSuite {
  import TestSpark._

  private val GoldenSeed = 1400L
  private val GoldenN = 600

  test("golden-seed sweep reproduces the DuckDB-verified snapshot") {
    GraftExtensions.injectInto(spark)
    val in = getClass.getResourceAsStream("/fuzz_golden_seed1400.jsonl")
    assert(in != null, "missing src/test/resources/fuzz_golden_seed1400.jsonl")
    val golden = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    assert(golden.size == GoldenN, s"snapshot has ${golden.size} lines, expected $GoldenN")
    // generation is sequential (the RNG stream defines the snapshot);
    // execution fans out over a small pool — the one-row shells are
    // independent and Dialect.sqlServed is the server's concurrent path
    val rng = new Random(GoldenSeed)
    val sqls = Vector.fill(GoldenN)(FuzzProbe.genQuery(rng))
    val lines = new Array[String](GoldenN)
    runPooled(GoldenN)(i => lines(i) = FuzzProbe.lineFor(spark, i, sqls(i)))
    val mismatches = (0 until GoldenN).filter(i => lines(i) != golden(i))
      .map(i => s"[$i] ${sqls(i)}\n  now:    ${lines(i).take(300)}\n  golden: ${golden(i).take(300)}")
    assert(mismatches.isEmpty,
      s"${mismatches.size} drifted from the verified snapshot:\n" +
        mismatches.take(5).mkString("\n"))
  }

  private def runPooled(n: Int)(body: Int => Unit): Unit = {
    val next = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        var i = next.getAndIncrement()
        while (i < n) { body(i); i = next.getAndIncrement() }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
  }

  test("fresh-seed sweep: the serving path never crashes on grammar text") {
    GraftExtensions.injectInto(spark)
    // seed from the commit hash: deterministic within a commit,
    // fresh coverage on every new one; fall back to a constant when
    // git is unavailable (e.g. an exported source tree)
    val seed =
      try {
        val h = scala.sys.process.Process(Seq("git", "rev-parse", "HEAD")).!!.trim
        java.lang.Long.parseLong(h.take(15), 16)
      } catch { case _: Throwable => 4242L }
    info(s"fresh sweep seed=$seed")
    val rng = new Random(seed)
    val crashClasses = Set("ParseException", "MatchError",
      "NullPointerException", "StringIndexOutOfBoundsException",
      "ArrayIndexOutOfBoundsException", "IndexOutOfBoundsException",
      "StackOverflowError", "EmptyStackException", "NoSuchElementException",
      "UnsupportedOperationException", "ClassCastException")
    val n = 400
    val sqls = Vector.fill(n)(FuzzProbe.genQuery(rng))
    val crashes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    runPooled(n) { i =>
      try {
        graft.server.Dialect.sqlServed(spark,
          graft.server.Dialect.rewrite(spark, sqls(i))).collect()
      } catch {
        case e: Throwable =>
          // walk the cause chain: a crash class wrapped in a
          // SparkException is still a crash
          var t = e
          var found: String = null
          while (t != null && found == null) {
            if (crashClasses.contains(t.getClass.getSimpleName))
              found = t.getClass.getSimpleName
            t = if (t.getCause ne t) t.getCause else null
          }
          if (found != null)
            crashes.add(s"[$i][$found] ${sqls(i)} :: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(crashes.isEmpty,
      s"${crashes.size} crash-class failures:\n" +
        crashes.toArray.take(8).mkString("\n"))
  }
}
