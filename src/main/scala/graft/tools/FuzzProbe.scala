package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.server.Dialect

/** Round-13 verdict ask #1: grammar-fuzz the serving plane against
  * DuckDB.
  *
  * The hand-curated probe tiers (1–28) plateaued — tier 28 found
  * nothing — yet tier 19's history proves systematic blind spots
  * survive curation (18 tiers of hand-written `[0-9]` pins missed the
  * `\d` string-escape bug). This main is the systematic complement: a
  * SEEDED, type-directed random expression/query generator over the
  * implemented dialect surface. Every generated text runs through the
  * full serving path (`Dialect.rewrite` + `Dialect.sqlServed`) and the
  * result is dumped as canonical JSONL; `tools/fuzz_check.py` replays
  * the identical texts in python3-duckdb and diffs values with the
  * same tolerance discipline as tools/check.py.
  *
  * Usage: runMain graft.tools.FuzzProbe <out.jsonl> [n] [seed]
  * Deterministic per (n, seed): the ledger in COVERAGE.md cites the
  * sweep's seed so any divergence replays exactly.
  *
  * Generator shape:
  *   - 70% scalar shells: `SELECT e1 AS c1 … e4 AS c4` (no FROM; one
  *     row) — expressions are type-directed (INT/DOUBLE/STRING/BOOL)
  *     with NULL and edge literals, nested 2–3 deep across arithmetic,
  *     comparison, CASE, COALESCE/NULLIF, string/math functions, LIKE,
  *     IN, BETWEEN, casts (CAST/TRY_CAST/`::`).
  *   - 15% aggregate shells over an inline VALUES relation (typed
  *     columns k/i/d/s with planted NULLs), GROUP BY k, total ORDER BY.
  *   - 15% window shells over the same relation with a unique tiebreak
  *     key so every output is deterministic.
  *
  * Determinism rules: no random()/uuid()/now(), integer literals
  * bounded so int64 never overflows (DuckDB would promote to HUGEINT
  * where Spark wraps), float comparisons left to the checker's 1e-9
  * relative tolerance (pow/exp are ~1-ulp engine-dependent).
  */
object FuzzProbe {

  sealed trait Ty
  case object TI extends Ty // integral
  case object TD extends Ty // double
  case object TS extends Ty // string
  case object TB extends Ty // boolean
  case object TDt extends Ty // date (v2 grammar)
  case object TTs extends Ty // timestamp (v2 grammar)
  case object TL extends Ty // list<integral> (v2 grammar)

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/fuzz.jsonl"
    val n = if (args.length > 1) args(1).toInt else 5000
    val seed = if (args.length > 2) args(2).toLong else 13L
    // grammar v7 (round-14 ask #3): a 4th arg names a fixture dir —
    // the sweep then generates RELATIONAL shells over the real parquet
    // tables (scan/pushdown, joins with planted NULL keys, aggregates/
    // windows/subqueries over real columns); fuzz_check.py --sf <dir>
    // registers the same files as DuckDB views.
    val sfDir = if (args.length > 3) Some(args(3)) else None
    // grammar v8 (round-14 second sweep): a 5th `v8` argument selects
    // the rewrite-heavy relational tail over the same fixtures; the
    // 4-arg form stays grammar v7 so the documented v7 sweep seeds
    // replay unchanged. Grammar v9 (round-15): the nested-type plane —
    // a nested parquet fixture is materialized to target/fuzz_nested
    // and fuzz_check.py registers it with --nested.
    val grammar = if (args.length > 4) args(4) else "v7"
    val spark = graft.GraftSession.tune(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.injectInto(spark)
    sfDir.foreach { d =>
      if (grammar == "v9") registerFixturesV9(spark, d, "target/fuzz_nested")
      else registerFixtures(spark, d)
    }
    val rng = new Random(seed)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val sql =
        if (sfDir.isDefined && grammar == "v9") genQueryV9(rng)
        else if (sfDir.isDefined && grammar == "v8") genQueryV8(rng)
        else if (sfDir.isDefined) genQueryV7(rng)
        else genQuery(rng)
      val line = lineFor(spark, i, sql)
      sb.append(line).append('\n')
      if (i % 500 == 0) {
        System.err.println(s"[fuzz] $i/$n")
        flush(out, sb, i == 0)
      }
      i += 1
    }
    flush(out, sb, append = n <= 0)
    println(s"[fuzz] wrote $n results to $out (seed=$seed)")
    spark.stop()
  }

  /** One generated query through the full serving path, rendered as the
    * canonical JSONL line (shared by main and FuzzRegressionSpec). */
  def lineFor(spark: SparkSession, i: Int, sql: String): String =
    try {
      val df = Dialect.sqlServed(spark, Dialect.rewrite(spark, sql))
      val cols = df.columns
      val rows = df.collect()
      s"""{"id":$i,"sql":${js(sql)},"ok":true,"cols":[${cols.map(js).mkString(",")}],""" +
        s""""rows":[${rows.map(r => renderRow(r)).mkString(",")}]}"""
    } catch {
      case e: Throwable =>
        val msg = (e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).takeWhile(_ != '\n')).take(300)
        s"""{"id":$i,"sql":${js(sql)},"ok":false,"err":${js(msg)}}"""
    }

  private def flush(out: String, sb: StringBuilder, append: Boolean): Unit = {
    val opts =
      if (append) Seq(StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      else Seq(StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8), opts: _*)
    sb.clear()
  }

  // ---------- JSON rendering (canonical; mirrored in fuzz_check.py) ----------

  def js(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def renderVal(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case b: Byte => b.toString
    case s: Short => s.toString
    case x: Int => x.toString
    case x: Long => x.toString
    case f: Float => renderVal(f.toDouble)
    case d: Double =>
      if (d.isNaN) "\"NaN\""
      else if (d.isPosInfinity) "\"Infinity\""
      else if (d.isNegInfinity) "\"-Infinity\""
      else if (d == math.rint(d) && math.abs(d) < 1e15)
        // integral doubles render width-free so 4.0 == 4 across engines
        { val l = d.toLong; if (l == 0L && (1.0 / d) < 0) "-0.0" else l.toString }
      else d.toString
    case bd: java.math.BigDecimal => renderVal(bd.doubleValue)
    case bd: BigDecimal => renderVal(bd.doubleValue)
    case s: String => js(s)
    // ".0" strip: java.sql.Timestamp.toString always renders at least
    // one fractional digit; python's str(datetime) renders none when
    // the micros are zero — canonicalize to the python form
    case d: java.sql.Date => js(d.toString)
    case t: java.sql.Timestamp => js(t.toString.stripSuffix(".0"))
    case d: java.time.LocalDate => js(d.toString)
    // LocalDateTime.toString omits :00 seconds entirely (ISO-8601),
    // where python's str(datetime) always prints them — format with
    // explicit seconds, fractional part only when nonzero (grammar-v7
    // finding: TIMESTAMP_NTZ parquet columns collect as LocalDateTime)
    case t: java.time.LocalDateTime =>
      js(t.format(java.time.format.DateTimeFormatter.ofPattern(
        if (t.getNano == 0) "yyyy-MM-dd HH:mm:ss"
        else "yyyy-MM-dd HH:mm:ss.SSSSSS")))
    case t: java.time.Instant => js(t.toString)
    case a: Array[_] => a.map(renderVal).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(renderVal).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(j => renderVal(r.get(j))).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, vv) => s"[${renderVal(k)},${renderVal(vv)}]" }
        .sorted.mkString("[", ",", "]")
    case other => js(other.toString)
  }

  def renderRow(r: org.apache.spark.sql.Row): String =
    (0 until r.length).map(j => renderVal(r.get(j))).mkString("[", ",", "]")

  // ---------- generator ----------

  private def pick[A](rng: Random, xs: Seq[A]): A = xs(rng.nextInt(xs.length))

  private val IntLits = Seq("0", "1", "-1", "2", "3", "7", "-5", "42", "100", "1000", "NULL")
  private val DblLits = Seq("0.0", "1.5", "-2.5", "0.1", "3.25", "-0.75", "100.0",
    "12345.678", "0.001", "NULL")
  private val StrLits = Seq("''", "'a'", "'Ab'", "'hello world'", "'Graft'",
    "'%a_'", "'  pad  '", "'123'", "'12.5'", "'x,y;z'", "'it''s'", "'ÄbÇ'",
    // v6: the hard Unicode case-mapping codepoints (sharp s, dotted
    // capital I, capital sigma — CaseMapDispatch's simple-mapping rules)
    "'ß'", "'İs'", "'ΑΣ'", "NULL")
  private val BoolLits = Seq("true", "false", "NULL")
  // typed NULLs: DuckDB refuses untyped NULL in date arithmetic
  // ("could not choose a best candidate") where Spark coerces — typing
  // the literal keeps the differ comparing VALUES, not binder noise
  private val DateLits = Seq("DATE '2024-03-05'", "DATE '1999-12-31'",
    "DATE '2024-02-29'", "DATE '1970-01-01'", "CAST(NULL AS DATE)")
  private val TsLits = Seq("TIMESTAMP '2024-03-05 01:02:03'",
    "TIMESTAMP '2000-01-01 00:00:00'", "TIMESTAMP '2024-12-31 23:59:59'",
    "CAST(NULL AS TIMESTAMP)")
  private val ListLits = Seq("[1, 2, 3]", "[7]", "[-5, 0, 42]", "[1, 1, 2]",
    "[NULL, 1, 2]", "[]")

  def lit(rng: Random, t: Ty): String = t match {
    case TI => pick(rng, IntLits)
    case TD => pick(rng, DblLits)
    case TS => pick(rng, StrLits)
    case TB => pick(rng, BoolLits)
    case TDt => pick(rng, DateLits)
    case TTs => pick(rng, TsLits)
    case TL => pick(rng, ListLits)
  }

  /** Type-directed expression over optional column bindings. */
  def expr(rng: Random, t: Ty, depth: Int, cols: Map[Ty, Seq[String]] = Map.empty): String = {
    def sub(tt: Ty): String = expr(rng, tt, depth - 1, cols)
    val colOpt = cols.getOrElse(t, Nil)
    if (depth <= 0) {
      if (colOpt.nonEmpty && rng.nextInt(3) == 0) pick(rng, colOpt) else lit(rng, t)
    } else t match {
      case TI => rng.nextInt(11) match {
        case 0 | 1 => lit(rng, TI)
        case 2 => s"(${sub(TI)} ${pick(rng, Seq("+", "-", "*"))} ${sub(TI)})"
        case 3 => s"(${sub(TI)} % ${pick(rng, Seq("3", "7", "10"))})"
        case 4 => s"${pick(rng, Seq("abs", "sign"))}(${sub(TI)})"
        case 5 => s"length(${sub(TS)})"
        case 6 => s"CASE WHEN ${sub(TB)} THEN ${sub(TI)} ELSE ${sub(TI)} END"
        case 7 => s"coalesce(${sub(TI)}, ${sub(TI)})"
        case 8 => pick(rng, Seq(
          s"greatest(${sub(TI)}, ${sub(TI)})",
          s"least(${sub(TI)}, ${sub(TI)})",
          s"nullif(${sub(TI)}, ${sub(TI)})"))
        case 9 => pick(rng, Seq(
          s"CAST(${sub(TS)} AS INTEGER)",
          s"TRY_CAST(${sub(TS)} AS INTEGER)",
          s"strpos(${sub(TS)}, ${sub(TS)})",
          s"(${sub(TI)} // ${pick(rng, Seq("2", "3", "5"))})"))
        case _ => pick(rng, Seq(
          s"CAST(date_part('${pick(rng, Seq("year", "month", "day", "dow", "doy", "hour"))}', ${sub(TTs)}) AS BIGINT)",
          s"CAST(EXTRACT(${pick(rng, Seq("YEAR", "MONTH", "DAY"))} FROM ${sub(TDt)}) AS BIGINT)",
          s"len(${sub(TL)})",
          s"list_sum(${sub(TL)})",
          s"(${sub(TL)})[${1 + rng.nextInt(3)}]",
          s"list_min(${sub(TL)})",
          s"list_max(${sub(TL)})"))
      }
      case TD => rng.nextInt(10) match {
        case 0 | 1 => lit(rng, TD)
        case 2 => s"(${sub(TD)} ${pick(rng, Seq("+", "-", "*"))} ${sub(TD)})"
        case 3 => s"(${sub(TD)} / ${sub(TD)})"
        case 4 => s"(${sub(TI)} / ${sub(TI)})"
        case 5 => s"${pick(rng, Seq("abs", "ceil", "floor", "sqrt", "exp", "ln"))}(${sub(TD)})"
        case 6 => s"round(${sub(TD)}, ${rng.nextInt(4)})"
        case 7 => s"CASE WHEN ${sub(TB)} THEN ${sub(TD)} ELSE ${sub(TD)} END"
        case 8 => s"coalesce(${sub(TD)}, ${sub(TD)})"
        case _ => pick(rng, Seq(
          s"CAST(${sub(TI)} AS DOUBLE)",
          s"TRY_CAST(${sub(TS)} AS DOUBLE)",
          s"(${sub(TD)} ^ ${pick(rng, Seq("2", "3", "0.5"))})"))
      }
      case TS => rng.nextInt(11) match {
        case 0 | 1 => lit(rng, TS)
        case 2 => s"${pick(rng, Seq("upper", "lower", "trim", "ltrim", "rtrim", "reverse"))}(${sub(TS)})"
        case 3 => s"(${sub(TS)} || ${sub(TS)})"
        case 4 => s"concat(${sub(TS)}, ${sub(TS)})"
        case 5 => s"substr(${sub(TS)}, ${1 + rng.nextInt(3)}, ${rng.nextInt(4)})"
        case 6 => s"replace(${sub(TS)}, ${lit(rng, TS)}, ${lit(rng, TS)})"
        case 7 => s"CASE WHEN ${sub(TB)} THEN ${sub(TS)} ELSE ${sub(TS)} END"
        case 8 => pick(rng, Seq(
          s"lpad(${sub(TS)}, ${rng.nextInt(8)}, 'x')",
          s"rpad(${sub(TS)}, ${rng.nextInt(8)}, 'y')",
          s"repeat(${sub(TS)}, ${rng.nextInt(3)})",
          s"left(${sub(TS)}, ${rng.nextInt(4)})",
          s"right(${sub(TS)}, ${rng.nextInt(4)})"))
        case 9 => pick(rng, Seq(
          s"CAST(${sub(TI)} AS VARCHAR)",
          s"CAST(${sub(TD)} AS VARCHAR)",
          s"(${sub(TI)})::VARCHAR",
          s"coalesce(${sub(TS)}, ${sub(TS)})",
          s"nullif(${sub(TS)}, ${sub(TS)})"))
        case _ => pick(rng, Seq(
          s"strftime(${sub(TDt)}, '${pick(rng, Seq("%Y-%m-%d", "%d/%m/%Y", "%Y %j"))}')",
          s"CAST(${sub(TDt)} AS VARCHAR)",
          s"CAST(${sub(TTs)} AS VARCHAR)",
          s"split_part(${sub(TS)}, ',', ${1 + rng.nextInt(3)})",
          s"translate(${sub(TS)}, 'ab', 'xy')"))
      }
      case TB => rng.nextInt(10) match {
        case 0 => lit(rng, TB)
        case 1 | 2 =>
          val tt = pick(rng, Seq(TI, TD, TS))
          s"(${sub(tt)} ${pick(rng, Seq("=", "<>", "<", "<=", ">", ">="))} ${sub(tt)})"
        case 3 => s"(${sub(TB)} ${pick(rng, Seq("AND", "OR"))} ${sub(TB)})"
        case 4 => s"(NOT ${sub(TB)})"
        case 5 => s"(${sub(pick(rng, Seq(TI, TD, TS)))} IS ${if (rng.nextBoolean()) "" else "NOT "}NULL)"
        case 6 => s"(${sub(TS)} LIKE ${pick(rng, Seq("'a%'", "'%b%'", "'_b%'", "'%'", "'%5'"))})"
        case 7 =>
          val v = sub(TI)
          s"($v IN (${Seq.fill(2 + rng.nextInt(3))(lit(rng, TI)).mkString(", ")}))"
        case 8 => s"(${sub(TI)} BETWEEN ${lit(rng, TI)} AND ${lit(rng, TI)})"
        case 9 => pick(rng, Seq(
          s"starts_with(${sub(TS)}, ${lit(rng, TS)})",
          s"contains(${sub(TS)}, ${lit(rng, TS)})",
          s"regexp_matches(${sub(TS)}, ${pick(rng, Seq("'a'", "'[0-9]+'", "'\\w+'", "'^a'", "'b$$'"))})"))
        case _ => pick(rng, Seq(
          s"(${sub(TDt)} ${pick(rng, Seq("=", "<", ">=", "<>"))} ${sub(TDt)})",
          s"(${sub(TTs)} ${pick(rng, Seq("<", ">"))} ${sub(TTs)})",
          s"list_contains(${sub(TL)}, ${sub(TI)})",
          s"(${sub(TL)} = ${sub(TL)})"))
      }
      case TDt => rng.nextInt(4) match {
        case 0 | 1 => lit(rng, TDt)
        case 2 => s"(${sub(TDt)} + INTERVAL '${1 + rng.nextInt(45)}' DAY)"
        case _ => s"CAST(${sub(TTs)} AS DATE)"
      }
      case TTs => rng.nextInt(5) match {
        case 0 | 1 => lit(rng, TTs)
        case 2 => s"(${sub(TTs)} + INTERVAL '${1 + rng.nextInt(20)}' HOUR)"
        case 3 => s"date_trunc('${pick(rng, Seq("month", "day", "hour", "year"))}', ${sub(TTs)})"
        case _ => s"CAST(${sub(TDt)} AS TIMESTAMP)"
      }
      case TL => rng.nextInt(8) match {
        case 0 | 1 => lit(rng, TL)
        case 2 => s"list_transform(${sub(TL)}, x -> x + ${lit(rng, TI)})"
        case 3 => s"list_filter(${sub(TL)}, x -> x > ${pick(rng, Seq("0", "1", "-5"))})"
        case 4 => s"list_concat(${sub(TL)}, ${sub(TL)})"
        // list_distinct's element order is UNSPECIFIED in DuckDB
        // (hash-table iteration) — sort to keep the compare meaningful
        case 5 => s"list_sort(list_distinct(${sub(TL)}))"
        case 6 => s"list_sort(${sub(TL)})"
        case _ => s"list_reverse_sort(${sub(TL)})"
      }
    }
  }

  /** The inline typed relation every FROM-shell uses: unique rn
    * tiebreak, planted NULLs in every payload column. */
  private def valuesRelation(rng: Random): String = {
    val nRows = 5 + rng.nextInt(5)
    val rows = (0 until nRows).map { r =>
      val k = rng.nextInt(3)
      val iv = if (rng.nextInt(5) == 0) "NULL" else (rng.nextInt(21) - 10).toString
      // d is DOUBLE-typed like every fixture float column: bare
      // decimals type DECIMAL in DuckDB, whose quantile_cont/median
      // truncate at the scale (documented omissions row)
      val dv = if (rng.nextInt(5) == 0) "CAST(NULL AS DOUBLE)"
        else s"CAST(${(rng.nextInt(4001) - 2000) / 100.0} AS DOUBLE)"
      val sv = if (rng.nextInt(5) == 0) "NULL" else pick(rng,
        Seq("'a'", "'b'", "'ab'", "'zz'", "''", "'q1'"))
      s"($r, $k, $iv, $dv, $sv)"
    }
    s"(VALUES ${rows.mkString(", ")}) t(rn, k, i, d, s)"
  }

  private val RelCols: Map[Ty, Seq[String]] =
    Map(TI -> Seq("i", "k"), TD -> Seq("d"), TS -> Seq("s"))

  /** A small keyed relation with planted NULL keys and values —
    * the join/set-op shells' input. */
  private def keyedRelation(rng: Random, keyNulls: Boolean): String = {
    val n = 4 + rng.nextInt(4)
    val rows = (0 until n).map { r =>
      val id = if (keyNulls && rng.nextInt(5) == 0) "NULL" else rng.nextInt(6).toString
      val v = if (rng.nextInt(5) == 0) "NULL" else (rng.nextInt(41) - 20).toString
      s"($id, $v)"
    }
    s"(VALUES ${rows.mkString(", ")})"
  }

  def genQuery(rng: Random): String = rng.nextInt(32) match {
    case x if x < 12 =>
      val items = (1 to 4).map { j =>
        val t = pick(rng, Seq(TI, TD, TS, TB, TI, TD, TS, TB, TDt, TTs, TL))
        s"${expr(rng, t, 2 + rng.nextInt(2))} AS c$j"
      }
      s"SELECT ${items.mkString(", ")}"
    case x if x >= 24 => genQueryV4(rng)
    case x if x == 12 || x == 13 =>
      // v4 scalar shells biased to the long-tail planes (regex, format,
      // JSON arrows, struct access, bit ops) at shallow depth so the
      // long-tail call is the outermost shape
      val items = (1 to 4).map { j =>
        val t = pick(rng, Seq(TI, TS, TS, TB, TI, TD))
        s"${exprV4(rng, t)} AS c$j"
      }
      s"SELECT ${items.mkString(", ")}"
    case x if x >= 20 && x < 22 =>
      // join shells: every join type over keyed relations with planted
      // NULL keys (NULL never matches), deterministic total order
      val a = keyedRelation(rng, keyNulls = true)
      val b = keyedRelation(rng, keyNulls = true)
      val jt = pick(rng, Seq("INNER JOIN", "LEFT JOIN", "RIGHT JOIN",
        "FULL JOIN", "SEMI JOIN", "ANTI JOIN"))
      if (jt == "SEMI JOIN" || jt == "ANTI JOIN")
        s"SELECT a.id AS aid, a.v AS av FROM $a a(id, v) $jt $b b(id, w) " +
          s"ON a.id = b.id ORDER BY aid NULLS LAST, av NULLS LAST"
      else {
        val cond = pick(rng, Seq("a.id = b.id", "a.id = b.id AND a.v < b.w"))
        s"SELECT a.id AS aid, b.id AS bid, a.v AS av, b.w AS bw " +
          s"FROM $a a(id, v) $jt $b b(id, w) ON $cond " +
          s"ORDER BY aid NULLS LAST, bid NULLS LAST, av NULLS LAST, bw NULLS LAST"
      }
    case 22 =>
      // set-op shells: duplicates + NULLs through all six variants
      val a = keyedRelation(rng, keyNulls = true)
      val b = keyedRelation(rng, keyNulls = true)
      val op = pick(rng, Seq("UNION", "UNION ALL", "INTERSECT",
        "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"))
      s"SELECT v FROM (SELECT v FROM $a t(id, v) $op SELECT w FROM $b s(id, w)) z " +
        s"ORDER BY v NULLS LAST"
    case 23 =>
      // subquery shells: IN / NOT IN (three-valued with NULLs) /
      // EXISTS / NOT EXISTS / scalar aggregate
      val a = keyedRelation(rng, keyNulls = false)
      val b = keyedRelation(rng, keyNulls = true)
      rng.nextInt(5) match {
        case 0 =>
          s"SELECT id, v FROM $a t(id, v) WHERE v IN (SELECT w FROM $b s(id, w)) " +
            s"ORDER BY id NULLS LAST, v NULLS LAST"
        case 1 =>
          s"SELECT id, v FROM $a t(id, v) WHERE v NOT IN (SELECT w FROM $b s(id, w)) " +
            s"ORDER BY id NULLS LAST, v NULLS LAST"
        case 2 =>
          s"SELECT id, v FROM $a t(id, v) WHERE EXISTS (SELECT 1 FROM $b s(id, w) " +
            s"WHERE s.id = t.id) ORDER BY id NULLS LAST, v NULLS LAST"
        case 3 =>
          s"SELECT id, v FROM $a t(id, v) WHERE NOT EXISTS (SELECT 1 FROM $b s(id, w) " +
            s"WHERE s.id = t.id AND s.w > t.v) ORDER BY id NULLS LAST, v NULLS LAST"
        case _ =>
          s"SELECT id, v, (SELECT ${pick(rng, Seq("max(w)", "min(w)", "CAST(count(w) AS BIGINT)"))} " +
            s"FROM $b s(id, w) WHERE s.id = t.id) AS m FROM $a t(id, v) " +
            s"ORDER BY id NULLS LAST, v NULLS LAST"
      }
    case x if x < 17 =>
      val rel = valuesRelation(rng)
      val aggs = (1 to 3).map { j =>
        val a = rng.nextInt(8) match {
          case 0 => s"sum(${expr(rng, TI, 1, RelCols)})"
          case 1 => s"round(sum(${expr(rng, TD, 1, RelCols)}), 6)"
          case 2 => s"count(${pick(rng, Seq("*", "i", "d", "s"))})"
          case 3 => s"min(${pick(rng, Seq("i", "d", "s"))})"
          case 4 => s"max(${pick(rng, Seq("i", "d", "s"))})"
          case 5 => s"round(avg(${expr(rng, TD, 1, RelCols)}), 6)"
          case 6 => s"count(DISTINCT ${pick(rng, Seq("i", "s", "k"))})"
          case _ => pick(rng, Seq(
            s"bool_and(${expr(rng, TB, 1, RelCols)})",
            s"bool_or(${expr(rng, TB, 1, RelCols)})",
            s"string_agg(s, ',' ORDER BY rn)"))
        }
        // sum/count can exceed int32 in DuckDB's rendering only via
        // HUGEINT — the checker compares numerically so width is moot
        s"$a AS a$j"
      }
      s"SELECT k, ${aggs.mkString(", ")} FROM $rel GROUP BY k ORDER BY k NULLS LAST"
    case _ =>
      val rel = valuesRelation(rng)
      val w = rng.nextInt(6) match {
        case 0 => "row_number() OVER (PARTITION BY k ORDER BY rn)"
        case 1 => s"rank() OVER (ORDER BY ${pick(rng, Seq("i", "d", "s"))} NULLS LAST, rn)"
        case 2 => s"sum(${expr(rng, TI, 1, RelCols)}) OVER (PARTITION BY k ORDER BY rn)"
        case 3 => s"lag(${pick(rng, Seq("i", "d", "s"))}, 1) OVER (ORDER BY rn)"
        case 4 => s"lead(${pick(rng, Seq("i", "d", "s"))}, 1) OVER (ORDER BY rn)"
        case _ => s"round(avg(d) OVER (ORDER BY rn ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), 6)"
      }
      s"SELECT rn, k, $w AS w FROM $rel ORDER BY rn NULLS LAST"
  }

  // ---------- grammar v7: relational shells over the real fixtures ----------

  def registerFixtures(spark: SparkSession, dir: String): Unit =
    Seq("lineitem", "orders", "customer", "events", "documents").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }

  /** Predicates over lineitem's real columns — numeric ranges, date
    * bounds, string membership, modulus selectors, and planted-NULL
    * forms (a CASE that nulls a fraction of keys, exercising
    * three-valued filtering over a real scan). */
  private def linePred(rng: Random): String = pick(rng, Seq(
    s"l_quantity > ${pick(rng, Seq("10", "25", "45", "49.5"))}",
    s"l_extendedprice BETWEEN ${pick(rng, Seq("1000.0", "5000.0"))} AND ${pick(rng, Seq("20000.0", "50000.0"))}",
    s"l_shipdate >= TIMESTAMP '${pick(rng, Seq("1996-06-01", "1998-01-01", "2000-03-15"))} 00:00:00'",
    s"l_shipdate < TIMESTAMP '${pick(rng, Seq("1996-01-01", "1999-07-01"))} 00:00:00'",
    s"l_returnflag ${pick(rng, Seq("= 'A'", "= 'N'", "IN ('A', 'R')", "<> 'N'"))}",
    s"l_discount <= ${pick(rng, Seq("0.02", "0.05", "0.08"))}",
    s"l_orderkey % ${pick(rng, Seq("7", "13", "41"))} = 0",
    s"(CASE WHEN l_orderkey % 37 = 0 THEN NULL ELSE l_quantity END) > ${pick(rng, Seq("25", "40"))}",
    s"l_linestatus = 'O' AND l_tax < 0.05",
    s"NOT (l_returnflag = 'R' OR l_quantity < ${pick(rng, Seq("5", "20"))})"))

  /** Projections over lineitem that route through the textual rewrite
    * planes (`::`, `//`, `^`, shifts, concat) with real columns. */
  private def lineExpr(rng: Random): String = pick(rng, Seq(
    "round(l_extendedprice * (1 - l_discount), 4)",
    "l_quantity::INTEGER",
    "(l_extendedprice // 1000)",
    "(l_quantity ^ 2)",
    "(l_linenumber << 2)",
    "(l_returnflag || '/' || l_linestatus)",
    "CAST(date_part('year', l_shipdate) AS BIGINT)",
    "date_trunc('month', l_shipdate)",
    "CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END",
    "coalesce(nullif(l_returnflag, 'N'), '?')",
    "levenshtein(l_returnflag, l_linestatus)",
    "greatest(l_quantity, l_discount * 100)"))

  private def lineAgg(rng: Random): String = pick(rng, Seq(
    "count(*)", "count(DISTINCT l_orderkey)", "count(DISTINCT l_returnflag)",
    "sum(l_quantity)", "sum(l_extendedprice)", "min(l_extendedprice)",
    "max(l_extendedprice)", "avg(l_quantity)", "avg(l_discount)",
    "stddev_samp(l_quantity)", "min(l_shipdate)", "max(l_shipdate)",
    "sum(l_extendedprice * (1 - l_discount))",
    "count(*) FILTER (WHERE l_quantity > 25)",
    "max(l_returnflag || l_linestatus)"))

  /** Group keys: real low-cardinality columns plus computed keys with
    * planted NULLs (NULL keys group together on both engines). */
  private def lineKey(rng: Random): String = pick(rng, Seq(
    "l_returnflag", "l_linestatus", "(l_orderkey % 5)",
    "CAST(date_part('year', l_shipdate) AS BIGINT)",
    "(CASE WHEN l_suppkey % 11 = 0 THEN NULL ELSE l_returnflag END)"))

  def genQueryV7(rng: Random): String = rng.nextInt(14) match {
    case 0 | 1 =>
      // scan/pushdown/project: filters reach the parquet scan, the
      // projection routes real columns through the rewrite planes
      val preds = (1 to (1 + rng.nextInt(2)))
        .map(_ => linePred(rng)).mkString(s" ${pick(rng, Seq("AND", "OR"))} ")
      // (l_orderkey, l_linenumber) is NOT unique in the fixture —
      // sorting by every output column makes any LIMIT cut
      // deterministic (fully tied rows are identical in the output)
      s"SELECT l_orderkey AS k1, l_linenumber AS k2, ${lineExpr(rng)} AS e " +
        s"FROM lineitem WHERE $preds ORDER BY k1, k2, e NULLS LAST LIMIT 20"
    case 2 | 3 =>
      // grouped aggregates over the full 60k-row scan
      val keys = Seq(lineKey(rng)) ++ (if (rng.nextBoolean()) Seq(lineKey(rng)) else Nil)
      val distinctKeys = keys.distinct
      val ks = distinctKeys.zipWithIndex.map { case (k, i) => s"$k AS g${i + 1}" }
      val gs = distinctKeys.indices.map(i => s"g${i + 1}")
      val aggs = (1 to 3).map(j => s"${lineAgg(rng)} AS a$j")
      val having = if (rng.nextInt(3) == 0)
        s" HAVING ${pick(rng, Seq("count(*) > 100", "sum(l_quantity) > 0", "min(l_orderkey) >= 0"))}" else ""
      val where = if (rng.nextBoolean()) s" WHERE ${linePred(rng)}" else ""
      s"SELECT ${ks.mkString(", ")}, ${aggs.mkString(", ")} FROM lineitem$where " +
        s"GROUP BY ${gs.mkString(", ")}$having ORDER BY ${gs.map(_ + " NULLS LAST").mkString(", ")}"
    case 4 | 5 =>
      // joins on the real FK — inner/left/semi/anti, planted-NULL key
      // variants (NULL never matches), aggregated to a small result
      rng.nextInt(5) match {
        case 0 =>
          s"SELECT o_orderstatus AS st, count(*) AS c, sum(l_quantity) AS sq " +
            s"FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
            s"WHERE ${linePred(rng)} GROUP BY st ORDER BY st"
        case 1 =>
          // planted NULL join key: a fraction of lineitem keys never match
          s"SELECT o_orderstatus AS st, count(*) AS c " +
            s"FROM lineitem JOIN orders ON " +
            s"(CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_orderkey END) = o_orderkey " +
            s"GROUP BY st ORDER BY st"
        case 2 =>
          // left join against a filtered build side: unmatched rows count
          s"SELECT o_orderstatus AS st, count(*) AS c, count(l.l_orderkey) AS cm " +
            s"FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > ${pick(rng, Seq("45", "48", "49.5"))}) l " +
            s"ON o_orderkey = l.l_orderkey GROUP BY st ORDER BY st"
        case 3 =>
          val jt = pick(rng, Seq("SEMI", "ANTI"))
          s"SELECT o_orderstatus AS st, count(*) AS c FROM orders $jt JOIN " +
            s"(SELECT * FROM lineitem WHERE ${linePred(rng)}) l ON o_orderkey = l.l_orderkey " +
            s"GROUP BY st ORDER BY st"
        case _ =>
          // 3-table: customer -> orders -> lineitem
          s"SELECT c_mktsegment AS seg, count(*) AS c, sum(l_extendedprice) AS sp " +
            s"FROM customer JOIN orders ON c_custkey = o_custkey " +
            s"JOIN lineitem ON o_orderkey = l_orderkey " +
            s"WHERE ${pick(rng, Seq("o_totalprice > 100000", "o_orderstatus = 'F'", "l_quantity > 40"))} " +
            s"GROUP BY seg ORDER BY seg"
      }
    case 6 =>
      // windows: lineitem keys are NOT unique, so order-sensitive
      // functions (row_number, lag, ROWS frames) run over ORDERS
      // (o_orderkey unique = total order); lineitem keeps the
      // tie-stable shapes (rank; running sum under the DEFAULT
      // tie-aware RANGE frame)
      rng.nextInt(5) match {
        case 0 =>
          s"SELECT k, w FROM (SELECT o_orderkey AS k, row_number() OVER " +
            s"(PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS w " +
            s"FROM orders WHERE o_orderkey % ${pick(rng, Seq("13", "17"))} = 0) z " +
            s"ORDER BY k LIMIT 25"
        case 1 =>
          s"SELECT k1, k2, w FROM (SELECT l_orderkey AS k1, l_linenumber AS k2, " +
            s"rank() OVER (ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS w " +
            s"FROM lineitem WHERE l_orderkey % ${pick(rng, Seq("29", "31"))} = 0) z " +
            s"ORDER BY k1, k2, w LIMIT 25"
        case 2 =>
          s"SELECT k1, k2, w FROM (SELECT l_orderkey AS k1, l_linenumber AS k2, " +
            s"sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS w " +
            s"FROM lineitem WHERE l_orderkey % ${pick(rng, Seq("29", "31"))} = 0) z " +
            s"ORDER BY k1, k2, w LIMIT 25"
        case 3 =>
          s"SELECT k, w FROM (SELECT o_orderkey AS k, " +
            s"lag(o_totalprice, 1) OVER (ORDER BY o_orderkey) AS w " +
            s"FROM orders WHERE o_orderkey % 19 = 0) z ORDER BY k LIMIT 25"
        case _ =>
          s"SELECT k, w FROM (SELECT o_orderkey AS k, " +
            s"avg(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey " +
            s"ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS w " +
            s"FROM orders WHERE o_orderkey % 11 = 0) z ORDER BY k LIMIT 25"
      }
    case 7 =>
      // subqueries: correlated scalar / IN / NOT IN with planted NULLs
      // (three-valued NOT IN over a real scan) / EXISTS
      rng.nextInt(4) match {
        case 0 =>
          s"SELECT o_orderkey AS k, (SELECT max(l_quantity) FROM lineitem " +
            s"WHERE l_orderkey = o_orderkey) AS m FROM orders " +
            s"WHERE o_orderkey % 59 = 0 ORDER BY k LIMIT 25"
        case 1 =>
          s"SELECT o_orderkey AS k FROM orders WHERE o_orderkey IN " +
            s"(SELECT l_orderkey FROM lineitem WHERE ${linePred(rng)}) " +
            s"AND o_orderkey % 17 = 0 ORDER BY k LIMIT 25"
        case 2 =>
          // the inner CASE plants NULLs: NOT IN over a set containing
          // NULL is never TRUE — both engines must return zero rows
          // when the planted class intersects, few rows otherwise
          s"SELECT count(*) AS c FROM orders WHERE o_orderkey NOT IN " +
            s"(SELECT CASE WHEN l_orderkey % ${pick(rng, Seq("53", "997"))} = 0 THEN NULL ELSE l_orderkey END " +
            s"FROM lineitem WHERE l_quantity > ${pick(rng, Seq("49", "45"))})"
        case _ =>
          s"SELECT o_orderstatus AS st, count(*) AS c FROM orders WHERE " +
            s"${if (rng.nextBoolean()) "" else "NOT "}EXISTS (SELECT 1 FROM lineitem " +
            s"WHERE l_orderkey = o_orderkey AND l_quantity > ${pick(rng, Seq("47", "49"))}) " +
            s"GROUP BY st ORDER BY st"
      }
    case 8 =>
      // events: time bucketing, epoch arithmetic, real-JSON props
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT date_trunc('${pick(rng, Seq("day", "month"))}', ts) AS d, event_type AS t, " +
            s"count(*) AS c, sum(value) AS sv FROM events " +
            s"WHERE event_type ${pick(rng, Seq("= 'click'", "IN ('view', 'purchase')", "<> 'error'"))} " +
            s"GROUP BY d, t ORDER BY d, t LIMIT 30"
        case 1 =>
          s"SELECT user_id AS u, count(*) AS c, max(CAST(props ->> 'k' AS INTEGER)) AS mk " +
            s"FROM events WHERE user_id % ${pick(rng, Seq("97", "53"))} = 0 " +
            s"GROUP BY u ORDER BY u LIMIT 25"
        case _ =>
          s"SELECT event_id AS e, value AS v, " +
            s"sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rv " +
            s"FROM events WHERE user_id % 101 = 0 ORDER BY e LIMIT 25"
      }
    case 9 =>
      // documents: string functions over real text
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT lang, count(*) AS c, sum(n_chars) AS s, max(length(text)) AS m " +
            s"FROM documents GROUP BY lang ORDER BY lang"
        case 1 =>
          s"SELECT doc_id AS id, ${pick(rng, Seq("lower", "upper"))}(substr(text, 1, ${5 + rng.nextInt(15)})) AS t " +
            s"FROM documents WHERE doc_id % ${pick(rng, Seq("17", "23"))} = 0 ORDER BY id LIMIT 15"
        case _ =>
          s"SELECT source AS src, count(*) FILTER (WHERE contains(text, '${pick(rng, Seq("the", "data", "e"))}')) AS c " +
            s"FROM documents GROUP BY src ORDER BY src LIMIT 25"
      }
    case 10 =>
      // set ops over real key relations (natural duplicates in lineitem)
      val op = pick(rng, Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT",
        "INTERSECT ALL", "EXCEPT ALL"))
      s"SELECT k FROM (SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > ${pick(rng, Seq("49", "49.5"))} " +
        s"$op SELECT o_orderkey FROM orders WHERE o_totalprice < ${pick(rng, Seq("2000", "5000"))}) z " +
        s"ORDER BY k LIMIT 25"
    case 11 =>
      // DISTINCT / DISTINCT ON over naturally duplicated real columns
      if (rng.nextBoolean())
        s"SELECT DISTINCT l_returnflag AS f, l_linestatus AS st FROM lineitem ORDER BY f, st"
      else
        s"SELECT DISTINCT ON (l_returnflag) l_returnflag AS f, l_orderkey AS k, l_linenumber AS n " +
          s"FROM lineitem ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber"
    case 12 =>
      // duplicate amplification: UNION ALL self-append then re-aggregate
      s"SELECT k, count(*) AS c FROM (SELECT l_returnflag AS k FROM lineitem " +
        s"UNION ALL SELECT l_returnflag FROM lineitem WHERE ${linePred(rng)}) z " +
        s"GROUP BY k ORDER BY k"
    case _ =>
      // orders-plane aggregates with computed/planted-NULL keys
      val key = pick(rng, Seq(
        "o_orderstatus", "o_orderpriority",
        "CAST(date_part('year', o_orderdate) AS BIGINT)",
        "(CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_orderstatus END)"))
      s"SELECT $key AS g, count(*) AS c, sum(o_totalprice) AS sp, " +
        s"${pick(rng, Seq("min(o_orderdate)", "max(o_orderdate)", "avg(o_totalprice)", "count(DISTINCT o_custkey)"))} AS m " +
        s"FROM orders${if (rng.nextBoolean()) s" WHERE o_totalprice > ${pick(rng, Seq("50000", "200000"))}" else ""} " +
        s"GROUP BY g ORDER BY g NULLS LAST"
  }

  // ---------- grammar v8: the rewrite-heavy relational tail over real fixtures ----------

  /** Round-14 second relational sweep: every family below routes
    * through a NONTRIVIAL serving-plane rewrite — QUALIFY subquery
    * wrap, GROUPS/EXCLUDE frame rewrites, COLUMNS()/star-modifier
    * expansion, UNION BY NAME, the quantified-comparison CASE rewrite,
    * the simplified-PIVOT statement, in-aggregate ORDER BY comparators,
    * GROUPING SETS shells — applied ON TOP of real parquet scans, while
    * DuckDB runs each shape natively over the same files. Grammar v7
    * fuzzed the scan/join/agg planes themselves; v8 fuzzes the
    * rewrites composed over them. Determinism: every output carries a
    * total ORDER BY (grouping ids disambiguate subtotal NULLs from
    * planted data NULLs; in-aggregate sorts order by the aggregated
    * value itself so ties concatenate identically). */
  def genQueryV8(rng: Random): String = rng.nextInt(14) match {
    case 0 =>
      // GROUPING SETS / ROLLUP / CUBE + GROUPING() over real keys
      val spec = pick(rng, Seq(
        "GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())",
        "GROUPING SETS ((l_returnflag), (l_linestatus))",
        "ROLLUP (l_returnflag, l_linestatus)",
        "CUBE (l_returnflag, l_linestatus)"))
      val where = if (rng.nextBoolean()) s" WHERE ${linePred(rng)}" else ""
      s"SELECT l_returnflag AS g1, l_linestatus AS g2, " +
        s"grouping(l_returnflag) AS i1, grouping(l_linestatus) AS i2, count(*) AS c, " +
        s"${pick(rng, Seq("sum(l_quantity)", "round(sum(l_extendedprice), 4)", "min(l_shipdate)"))} AS a " +
        s"FROM lineitem$where GROUP BY $spec " +
        s"ORDER BY i1, i2, g1 NULLS LAST, g2 NULLS LAST"
    case 1 =>
      // GROUP BY ALL over orders (with a computed second key sometimes)
      val keys = Seq(pick(rng, Seq("o_orderstatus", "o_orderpriority"))) ++
        (if (rng.nextBoolean()) Seq("CAST(date_part('year', o_orderdate) AS BIGINT)") else Nil)
      val ks = keys.zipWithIndex.map { case (k, i) => s"$k AS g${i + 1}" }
      val gs = keys.indices.map(i => s"g${i + 1}")
      s"SELECT ${ks.mkString(", ")}, count(*) AS c, round(sum(o_totalprice), 4) AS sp " +
        s"FROM orders${if (rng.nextBoolean()) s" WHERE o_totalprice > ${pick(rng, Seq("50000", "150000"))}" else ""} " +
        s"GROUP BY ALL ORDER BY ${gs.mkString(", ")}"
    case 2 =>
      // QUALIFY (the subquery-wrap rewrite); the admitted SET is
      // value-determined even for rank() ties
      val wf = pick(rng, Seq(
        "row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)",
        "rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)",
        "row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)"))
      s"SELECT o_orderkey AS k, o_orderstatus AS st FROM orders " +
        s"${if (rng.nextBoolean()) s"WHERE o_orderkey % ${pick(rng, Seq("3", "7"))} = 0 " else ""}" +
        s"QUALIFY $wf <= ${2 + rng.nextInt(4)} ORDER BY k"
    case 3 =>
      // FULL / RIGHT outer joins with disjoint-modulus sides, aggregated
      val a = s"(SELECT l_orderkey AS k, l_quantity AS q FROM lineitem " +
        s"WHERE l_orderkey % ${pick(rng, Seq("3", "5"))} = ${rng.nextInt(2)})"
      val b = s"(SELECT o_orderkey AS k, o_totalprice AS p FROM orders " +
        s"WHERE o_orderkey % ${pick(rng, Seq("2", "7"))} = ${rng.nextInt(2)})"
      val jt = pick(rng, Seq("FULL JOIN", "RIGHT JOIN"))
      s"SELECT count(*) AS c, count(a.k) AS ca, count(b.k) AS cb, " +
        s"round(sum(a.q), 4) AS sq, round(sum(b.p), 4) AS sp FROM $a a $jt $b b ON a.k = b.k"
    case 4 =>
      // USING / NATURAL join forms over renamed real keys
      val a = s"(SELECT l_orderkey AS k, l_quantity AS q FROM lineitem WHERE ${linePred(rng)}) a"
      val b = "(SELECT o_orderkey AS k, o_totalprice AS p FROM orders) b"
      if (rng.nextBoolean())
        s"SELECT count(*) AS c, round(sum(q), 4) AS s1, round(sum(p), 2) AS s2 FROM $a NATURAL JOIN $b"
      else
        s"SELECT k, count(*) AS c FROM $a ${pick(rng, Seq("JOIN", "LEFT JOIN"))} $b USING (k) " +
          s"GROUP BY k ORDER BY k LIMIT 20"
    case 5 =>
      // CTE chain joined back (WITH name reuse through USING)
      s"WITH big AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders " +
        s"WHERE o_totalprice > ${pick(rng, Seq("100000", "200000"))}), " +
        s"agg AS (SELECT l_orderkey AS k, sum(l_quantity) AS sq, count(*) AS n " +
        s"FROM lineitem GROUP BY k) " +
        s"SELECT count(*) AS c, sum(sq) AS s, max(n) AS m FROM big JOIN agg USING (k)" +
        (if (rng.nextBoolean()) " WHERE sq > 50" else "")
    case 6 =>
      // GROUPS frames and EXCLUDE clauses (the frame rewrites) over
      // orders; GROUPS/EXCLUDE-GROUP/TIES order by the tied date key,
      // ROWS+EXCLUDE CURRENT ROW by the unique key
      val filt = s"WHERE o_orderkey % ${pick(rng, Seq("43", "59"))} = 0"
      rng.nextInt(6) match {
        case 0 =>
          s"SELECT o_orderkey AS k, sum(o_totalprice) OVER (ORDER BY o_orderdate " +
            s"GROUPS BETWEEN 1 PRECEDING AND ${pick(rng, Seq("CURRENT ROW", "1 FOLLOWING"))}) AS w " +
            s"FROM orders $filt ORDER BY k LIMIT 25"
        case 1 =>
          s"SELECT o_orderkey AS k, sum(o_totalprice) OVER (ORDER BY o_orderkey " +
            s"ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS w " +
            s"FROM orders $filt ORDER BY k LIMIT 25"
        case 2 =>
          s"SELECT o_orderkey AS k, count(*) OVER (ORDER BY o_orderdate " +
            s"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS w " +
            s"FROM orders $filt ORDER BY k LIMIT 25"
        case 3 =>
          s"SELECT o_orderkey AS k, sum(o_totalprice) OVER (ORDER BY o_orderdate " +
            s"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS w " +
            s"FROM orders $filt ORDER BY k LIMIT 25"
        case 4 =>
          // round-15: min/max EXCLUDE CURRENT ROW (the collected-frame
          // decomposition with one instance removed)
          s"SELECT o_orderkey AS k, ${pick(rng, Seq("min", "max"))}(o_totalprice) OVER " +
            s"(ORDER BY o_orderkey ROWS BETWEEN ${1 + rng.nextInt(3)} PRECEDING AND " +
            s"${1 + rng.nextInt(3)} FOLLOWING EXCLUDE CURRENT ROW) AS w " +
            s"FROM orders $filt ORDER BY k LIMIT 25"
        case _ =>
          // round-15: min/max EXCLUDE GROUP/TIES over a tied date key
          // (null-safe peer filter over the collected (key, value) frame)
          s"SELECT o_orderkey AS k, ${pick(rng, Seq("min", "max"))}(o_totalprice) OVER " +
            s"(ORDER BY o_orderdate RANGE BETWEEN UNBOUNDED PRECEDING AND " +
            s"${pick(rng, Seq("CURRENT ROW", "UNBOUNDED FOLLOWING"))} " +
            s"EXCLUDE ${pick(rng, Seq("GROUP", "TIES"))}) AS w " +
            s"FROM orders $filt ORDER BY k LIMIT 25"
      }
    case 7 =>
      // COLUMNS(regex) + star EXCLUDE/REPLACE expansion over real schemas
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT ${pick(rng, Seq("sum", "min", "max"))}(COLUMNS('l_(quantity|discount|tax)')) " +
            s"FROM lineitem WHERE ${linePred(rng)}"
        case 1 =>
          s"SELECT * EXCLUDE (o_custkey, o_orderpriority) " +
            s"REPLACE ((o_totalprice // 100) AS o_totalprice) FROM orders " +
            s"WHERE o_orderkey % ${pick(rng, Seq("499", "997"))} = 0 ORDER BY o_orderkey LIMIT 15"
        case _ =>
          s"SELECT COLUMNS('o_order(key|status)') FROM orders " +
            s"WHERE o_orderkey % ${pick(rng, Seq("599", "797"))} = 0 ORDER BY o_orderkey LIMIT 15"
      }
    case 8 =>
      // quantified ANY/ALL comparisons (the three-valued CASE rewrite)
      // over real subqueries
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT count(*) AS c FROM orders WHERE o_totalprice " +
            s"${pick(rng, Seq(">", ">=", "<"))} ${pick(rng, Seq("ALL", "ANY"))} " +
            s"(SELECT l_extendedprice FROM lineitem WHERE l_quantity > 49.5)"
        case 1 =>
          s"SELECT o_orderkey AS k FROM orders WHERE o_orderkey = ANY " +
            s"(SELECT l_orderkey FROM lineitem WHERE ${linePred(rng)}) " +
            s"AND o_orderkey % ${pick(rng, Seq("31", "53"))} = 0 ORDER BY k LIMIT 20"
        case _ =>
          s"SELECT count(*) AS c FROM lineitem WHERE l_quantity <> ALL " +
            s"(SELECT o_orderkey % 50 FROM orders WHERE o_orderkey % 977 = 0)"
      }
    case 9 =>
      // in-aggregate ORDER BY (the lexicographic comparator rewrite);
      // sort keys end with the element or a unique key so ties
      // concatenate identically on both engines
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT l_returnflag AS g, string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus) AS s " +
            s"FROM lineitem GROUP BY g ORDER BY g"
        case 1 =>
          s"SELECT o_orderstatus AS g, string_agg(CAST(o_orderkey AS VARCHAR), ',' " +
            s"ORDER BY o_totalprice DESC, o_orderkey) AS s FROM orders " +
            s"WHERE o_orderkey % ${pick(rng, Seq("199", "299"))} = 0 GROUP BY g ORDER BY g"
        case _ =>
          s"SELECT c_mktsegment AS g, array_agg(c_custkey ORDER BY c_acctbal DESC, c_custkey) AS a " +
            s"FROM customer WHERE c_custkey % 97 = 0 GROUP BY g ORDER BY g"
      }
    case 10 =>
      // NULLS FIRST + OFFSET over a planted-NULL computed sort key
      s"SELECT k, e FROM (SELECT o_orderkey AS k, " +
        s"CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_totalprice END AS e FROM orders " +
        s"WHERE o_orderkey % ${pick(rng, Seq("23", "29"))} = 0) z " +
        s"ORDER BY e ${pick(rng, Seq("NULLS FIRST", "DESC NULLS FIRST"))}, k " +
        s"LIMIT 20 OFFSET ${5 + rng.nextInt(10)}"
    case 11 =>
      // UNION [ALL] BY NAME with reordered select lists
      s"SELECT a, b FROM (SELECT l_returnflag AS a, count(*) AS b FROM lineitem GROUP BY a " +
        s"UNION ${if (rng.nextBoolean()) "ALL " else ""}BY NAME " +
        s"SELECT count(*) AS b, o_orderstatus AS a FROM orders GROUP BY a) z ORDER BY a, b"
    case 12 =>
      // LATERAL correlated derived table (comma + LATERAL spelling).
      // The body always carries a count(*) column: DuckDB's inner-
      // lateral decorrelation DROPS zero-input groups for non-count
      // aggregates (sum-only body: order 249 vanishes) but keeps them
      // with 0/NULL when any count appears — the classic count-bug
      // surface, measured 2026-08-16 and documented in the omissions
      // table; with the count present both engines agree INCLUDING
      // the zero-input rows, so the family pins the kept values
      s"SELECT o_orderkey AS k, z.m AS m, z.c AS c FROM orders, LATERAL " +
        s"(SELECT ${pick(rng, Seq("max(l_quantity)", "min(l_quantity)", "round(sum(l_extendedprice), 4)"))} AS m, " +
        s"count(*) AS c FROM lineitem WHERE l_orderkey = o_orderkey) z " +
        s"WHERE o_orderkey % ${pick(rng, Seq("61", "83"))} = 0 ORDER BY k LIMIT 20"
    case _ =>
      // the simplified PIVOT statement (value enumeration + the
      // round-14 ORDER BY/LIMIT tail)
      s"PIVOT lineitem ON l_linestatus USING " +
        s"${pick(rng, Seq("sum(l_quantity)", "min(l_extendedprice)", "max(l_extendedprice)"))} " +
        s"GROUP BY l_returnflag ORDER BY l_returnflag" +
        (if (rng.nextBoolean()) " LIMIT 3" else "")
  }

  // ---------- grammar v9: the nested-type plane over real parquet ----------

  /** v9 fixture: a NESTED parquet table materialized from the real
    * fixtures (arrays derived from events + a real float-vector column
    * joined from embeddings; struct/map/JSON from events), then read
    * back FROM PARQUET by BOTH engines — v7 fuzzed flat relational
    * columns and v8 the rewrites; nested types read from parquet had
    * never been fuzzed end-to-end (round-14 verdict ask #4). Columns:
    *   nid    BIGINT                          unique key
    *   ints   ARRAY<BIGINT>   1–5 elems, planted NULL elems + NULL rows
    *   strs   ARRAY<STRING>   planted NULL elems
    *   st     STRUCT<a BIGINT, b STRING, c DOUBLE>  planted NULL rows
    *   mp     MAP<STRING,BIGINT>  fixed keys t/n, planted NULL values
    *   js     STRING          real JSON text (events.props)
    *   emb    ARRAY<FLOAT>    real embedding vectors, planted NULL rows
    * Deterministic (pure arithmetic on event_id), regenerated per sweep
    * (cheap), written single-file so DuckDB's glob sees one footer.
    */
  def registerFixturesV9(spark: SparkSession, dir: String, out: String): Unit = {
    registerFixtures(spark, dir)
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("embeddings")
    spark.sql(
      """SELECT e.event_id AS nid,
        |  CASE WHEN e.event_id % 11 = 0 THEN NULL ELSE
        |    transform(sequence(1, CAST(e.event_id % 5 AS INT) + 1),
        |      x -> CASE WHEN (CAST(e.event_id AS INT) + x) % 7 = 0 THEN CAST(NULL AS BIGINT)
        |           ELSE CAST((e.event_id * x) % 97 - 13 AS BIGINT) END)
        |  END AS ints,
        |  CASE WHEN e.event_id % 13 = 0 THEN array(CAST(NULL AS STRING), e.event_type)
        |       ELSE array(e.event_type, substring(e.event_type, 1, 2),
        |                  CAST(e.user_id % 5 AS STRING)) END AS strs,
        |  CASE WHEN e.event_id % 17 = 0 THEN CAST(NULL AS STRUCT<a: BIGINT, b: STRING, c: DOUBLE>)
        |       ELSE named_struct('a', e.user_id, 'b', e.event_type, 'c', round(e.value, 3)) END AS st,
        |  map('t', e.user_id % 10,
        |      'n', CASE WHEN e.event_id % 19 = 0 THEN CAST(NULL AS BIGINT) ELSE e.event_id % 7 END) AS mp,
        |  e.props AS js,
        |  CASE WHEN e.event_id % 23 = 0 THEN NULL ELSE emb.embedding END AS emb
        |FROM events e LEFT JOIN embeddings emb ON e.event_id % 500 = emb.vec_id
        |WHERE e.event_id % 2 = 0""".stripMargin)
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.read.parquet(out).createOrReplaceTempView("nested")
  }

  /** Deterministic filters over the nested fixture. */
  private def nestPred(rng: Random): String = pick(rng, Seq(
    s"nid % ${pick(rng, Seq("3", "7", "13"))} = 0",
    "st.a % 5 = 0",
    "len(ints) >= 3",
    "list_sum(ints) > 20",
    "st.b IN ('click', 'view')",
    "strs[1] IS NOT NULL",
    "emb IS NOT NULL AND nid % 9 = 0",
    "ints IS NULL OR nid % 21 = 0"))

  def genQueryV9(rng: Random): String = rng.nextInt(14) match {
    case 0 =>
      // list lambdas folded to scalars (transform/filter + sum/min/max)
      val lam = pick(rng, Seq("x -> x * 2 + 1", "x -> x % 5", "x -> -x",
        "x -> x + nid", "x -> abs(x)"))
      val fold = pick(rng, Seq("list_sum", "list_min", "list_max"))
      s"SELECT nid, $fold(list_transform(ints, $lam)) AS a, " +
        s"len(list_filter(ints, x -> x ${pick(rng, Seq("> 0", "< 10", "% 2 = 0"))})) AS b " +
        s"FROM nested WHERE ${nestPred(rng)} ORDER BY nid LIMIT 25"
    case 1 =>
      // subscripts and slices on parquet-read lists (1-based, negative,
      // out-of-bounds-NULL, clamped slices — the DuckDB semantics)
      val ix = pick(rng, Seq("1", "2", "3", "9", "-1"))
      s"SELECT nid, ints[$ix] AS a, ints[${1 + rng.nextInt(2)}:${2 + rng.nextInt(3)}] AS sl, " +
        s"strs[${pick(rng, Seq("1", "2", "-1"))}] AS s2 " +
        s"FROM nested WHERE ${nestPred(rng)} ORDER BY nid LIMIT 25"
    case 2 =>
      // unnest of a parquet-read list in the select list (+ regroup)
      if (rng.nextBoolean())
        s"SELECT nid, unnest(ints) AS u FROM nested " +
          s"WHERE nid % ${pick(rng, Seq("37", "53"))} = 0 ORDER BY nid, u NULLS LAST LIMIT 30"
      else
        s"SELECT count(*) AS c, sum(u) AS s, count(u) AS cu FROM " +
          s"(SELECT unnest(${pick(rng, Seq("ints", "list_transform(ints, x -> x % 11)"))}) AS u " +
          s"FROM nested WHERE ${nestPred(rng)}) z"
    case 3 =>
      // struct field access through filter/sort/group planes
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT nid, st.a AS a, st.b AS b, round(st.c, 2) AS c FROM nested " +
            s"WHERE st.a % ${pick(rng, Seq("3", "4"))} = 0 ORDER BY nid LIMIT 25"
        case 1 =>
          s"SELECT st.b AS g, count(*) AS c, sum(st.a) AS s, round(sum(st.c), 4) AS sc " +
            s"FROM nested GROUP BY st.b ORDER BY g NULLS LAST"
        case _ =>
          s"SELECT nid, CASE WHEN st IS NULL THEN 'none' ELSE st.b END AS b " +
            s"FROM nested WHERE nid % ${pick(rng, Seq("19", "29"))} = 0 ORDER BY nid LIMIT 25"
      }
    case 4 =>
      // map subscript / keys / cardinality (DuckDB 1.0 map[k] is
      // LIST-valued: [] on miss — the dialect must reproduce or stay
      // loud, never silently return the bare value)
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT nid, mp['${pick(rng, Seq("t", "n", "zz"))}'] AS v, cardinality(mp) AS c " +
            s"FROM nested WHERE ${nestPred(rng)} ORDER BY nid LIMIT 25"
        case 1 =>
          s"SELECT nid, list_sort(map_keys(mp)) AS ks FROM nested " +
            s"WHERE nid % ${pick(rng, Seq("31", "41"))} = 0 ORDER BY nid LIMIT 25"
        case _ =>
          // the grouped key is SCALARIZED ([1] on the list-valued map
          // extract): ORDER BY over raw lists with NULL elements is a
          // measured collation divergence (Spark sorts a NULL element
          // low, DuckDB high — COVERAGE.md omissions)
          s"SELECT element_at(mp, '${pick(rng, Seq("t", "n"))}')[1] AS v, count(*) AS c " +
            s"FROM nested GROUP BY v ORDER BY v NULLS LAST"
      }
    case 5 =>
      // JSON chains over the real props text, composed with casts
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT nid, js->>'k' AS k1, CAST(js->>'k' AS INTEGER) % 10 AS k2 " +
            s"FROM nested WHERE ${nestPred(rng)} ORDER BY nid LIMIT 25"
        case 1 =>
          s"SELECT CAST(js->>'k' AS INTEGER) % ${pick(rng, Seq("5", "7"))} AS g, count(*) AS c " +
            s"FROM nested GROUP BY g ORDER BY g NULLS LAST"
        case _ =>
          s"SELECT nid, json_extract_string(js, '$$.k') AS k1 FROM nested " +
            s"WHERE nid % ${pick(rng, Seq("43", "59"))} = 0 ORDER BY nid LIMIT 25"
      }
    case 6 =>
      // string-list ops (join/contains/position) with planted NULL elems
      s"SELECT nid, array_to_string(strs, '${pick(rng, Seq(",", "|"))}') AS j, " +
        s"list_contains(strs, '${pick(rng, Seq("click", "view", "zz"))}') AS c, " +
        s"list_position(strs, '${pick(rng, Seq("signup", "error"))}') AS p " +
        s"FROM nested WHERE ${nestPred(rng)} ORDER BY nid LIMIT 25"
    case 7 =>
      // the real float-vector column: double-cast folds (norms, dots
      // against a constant plane) — unrounded, the checker's 1e-9
      // relative tolerance absorbs engine ulp
      s"SELECT nid, list_sum(list_transform(emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm, " +
        s"len(emb) AS d FROM nested WHERE emb IS NOT NULL AND nid % ${pick(rng, Seq("27", "39"))} = 0 " +
        s"ORDER BY nid LIMIT 20"
    case 8 =>
      // nested ops composed with the v8 rewrite planes (// ^ << ::)
      s"SELECT nid, (list_sum(ints) // ${pick(rng, Seq("3", "5"))}) AS a, " +
        s"(len(strs) << ${1 + rng.nextInt(2)}) AS b, " +
        s"(coalesce(ints[1], 0) ^ 2)::BIGINT AS p " +
        s"FROM nested WHERE ${nestPred(rng)} ORDER BY nid LIMIT 25"
    case 9 =>
      // whole-list outputs with pinned order: sort / distinct-sorted /
      // slice render as lists on both sides
      rng.nextInt(3) match {
        case 0 =>
          s"SELECT nid, list_sort(ints) AS s FROM nested " +
            s"WHERE nid % ${pick(rng, Seq("33", "47"))} = 0 ORDER BY nid LIMIT 25"
        case 1 =>
          s"SELECT nid, list_sort(list_distinct(ints)) AS d FROM nested " +
            s"WHERE nid % ${pick(rng, Seq("35", "49"))} = 0 ORDER BY nid LIMIT 25"
        case _ =>
          s"SELECT nid, list_sort(ints, 'DESC') AS s FROM nested " +
            s"WHERE nid % ${pick(rng, Seq("51", "63"))} = 0 ORDER BY nid LIMIT 25"
      }
    case 10 =>
      // aggregates whose inputs are nested-derived scalars
      s"SELECT ${pick(rng, Seq("st.b", "(nid % 4)"))} AS g, count(*) AS c, " +
        s"sum(list_sum(ints)) AS s, max(len(strs)) AS m, " +
        s"round(avg(coalesce(ints[1], 0)), 6) AS a " +
        s"FROM nested GROUP BY 1 ORDER BY g NULLS LAST"
    case 11 =>
      // joins keyed on nested-derived values (struct field, map value)
      if (rng.nextBoolean())
        s"SELECT a.nid AS n1, b.nid AS n2 FROM nested a JOIN nested b " +
          s"ON a.st.a = b.st.a AND a.nid + ${1 + rng.nextInt(3)} = b.nid " +
          s"WHERE a.nid % ${pick(rng, Seq("57", "71"))} = 0 ORDER BY n1, n2 LIMIT 25"
      else
        s"SELECT o.o_orderkey AS k, n.nid FROM orders o JOIN nested n " +
          s"ON o.o_orderkey = n.nid WHERE n.st.a % 7 = 0 ORDER BY k LIMIT 25"
    case 12 =>
      // windows over nested-derived keys and values
      s"SELECT nid, row_number() OVER (PARTITION BY st.b ORDER BY list_sum(ints) " +
        s"${pick(rng, Seq("ASC", "DESC"))} NULLS LAST, nid) AS rn " +
        s"FROM nested WHERE nid % ${pick(rng, Seq("9", "15"))} = 0 ORDER BY nid LIMIT 30"
    case _ =>
      // list containment / quantified membership in predicates
      rng.nextInt(2) match {
        case 0 =>
          s"SELECT nid FROM nested WHERE list_contains(list_transform(ints, x -> x % 5), " +
            s"${rng.nextInt(5)}) ORDER BY nid LIMIT 25"
        case _ =>
          s"SELECT count(*) AS c FROM nested WHERE coalesce(ints[1], 0) IN " +
            s"(SELECT nid % 20 FROM nested WHERE nid % 101 = 0)"
      }
  }

  // ---------- grammar v4: long-tail scalar planes + query shells ----------

  private val JsonLits = Seq(
    """'{"a": 1, "b": [1, 2, 3], "c": {"d": "x"}, "e": null}'""",
    """'{"a": -7.5, "b": [], "c": {"d": ""}, "s": "it''s"}'""",
    """'{"a": true, "b": [10], "c": {"d": "Yy"}, "n": 42}'""",
    """'[3, 1, 2]'""",
    """'{"a": "1", "b": [null, 4], "c": {}}'""")

  private val RegexPats = Seq("'[0-9]+'", "'\\d+'", "'[a-z]+'", "'(a)(b)'",
    "'l+'", "'^\\s*'", "'o'", "'[aeiou]'")
  private val RegexReps = Seq("'_'", "''", "'<&>'", "'X'", "'\\2\\1'")

  /** Long-tail scalar expressions: regex, format/printf, JSON arrows,
    * struct field access, bit ops, similarity, codepoints, hashing.
    * Leaves are v1 expr at depth 1 so the long-tail call dominates. */
  def exprV4(rng: Random, t: Ty): String = {
    def leaf(tt: Ty): String = expr(rng, tt, 1)
    val j = pick(rng, JsonLits)
    t match {
      case TI => rng.nextInt(12) match {
        case 10 =>
          // v6: boundary-counting date_diff + epoch + extract long tail
          pick(rng, Seq(
            s"date_diff('${pick(rng, Seq("day", "month", "year", "week", "quarter"))}', ${leaf(TDt)}, ${leaf(TDt)})",
            s"CAST(epoch(${leaf(TTs)}) AS BIGINT)",
            s"CAST(date_part('${pick(rng, Seq("quarter", "week", "isodow", "yearweek"))}', ${leaf(TDt)}) AS BIGINT)"))
        case 11 =>
          // v6: list long tail
          pick(rng, Seq(
            s"CAST(list_aggregate(${leaf(TL)}, 'sum') AS BIGINT)",
            s"len(list_distinct(${leaf(TL)}))",
            s"list_position(${leaf(TL)}, ${lit(rng, TI)})",
            s"len(flatten([${leaf(TL)}, ${leaf(TL)}]))"))
        case 0 => s"(${leaf(TI)} ${pick(rng, Seq("&", "|"))} ${leaf(TI)})"
        case 1 => s"xor(${leaf(TI)}, ${leaf(TI)})"
        // shifts now reproduce DuckDB rule-for-rule (ShiftDispatch):
        // negative/overflow edges are loud on BOTH engines
        case 2 => s"(${pick(rng, Seq("1", "3", "100", "-8", "0"))} " +
          s"${pick(rng, Seq("<<", ">>"))} ${pick(rng, Seq("0", "1", "2", "4", "35", "-1"))})"
        case 3 => s"ascii(${leaf(TS)})"
        case 4 => s"levenshtein(${leaf(TS)}, ${leaf(TS)})"
        case 5 => s"instr(${leaf(TS)}, ${lit(rng, TS)})"
        case 6 => s"json_array_length(${pick(rng, Seq("'[1,2,3]'", "'[]'", j))})"
        case 7 => s"bit_count(${pick(rng, Seq("0", "1", "-1", "255", "1000"))})"
        case 8 => s"({'a': ${leaf(TI)}, 'b': ${leaf(TS)}}).a"
        case _ => s"greatest(${leaf(TI)}, ${leaf(TI)}, ${leaf(TI)})"
      }
      case TD => rng.nextInt(4) match {
        case 0 => s"round((${leaf(TD)} % ${pick(rng, Seq("2.5", "0.3", "7.0"))}), 6)"
        case 1 => s"round(${pick(rng, Seq("pi()", "degrees(1.0)", "radians(90.0)"))}, 6)"
        case 2 => s"round(atan2(${leaf(TD)}, ${leaf(TD)}), 6)"
        case _ => s"round(${pick(rng, Seq("log10", "log2", "cbrt", "sin", "cos", "tan", "asin", "acos", "atan"))}(${leaf(TD)}), 6)"
      }
      case TS => rng.nextInt(16) match {
        case 14 =>
          // v6: calendar-name + strftime long tail
          pick(rng, Seq(
            s"dayname(${leaf(TDt)})",
            s"monthname(${leaf(TDt)})",
            s"strftime(${leaf(TTs)}, '${pick(rng, Seq("%H:%M:%S", "%Y-%m-%dT%H:%M", "%j/%Y", "%A %B"))}')",
            s"CAST(last_day(${leaf(TDt)}) AS VARCHAR)",
            s"CAST(make_date(2024, ${1 + rng.nextInt(12)}, ${1 + rng.nextInt(28)}) AS VARCHAR)"))
        case 15 =>
          // v6: JSON path forms + chained arrows
          val jj = pick(rng, JsonLits)
          pick(rng, Seq(
            s"json_extract_string($jj, '$$.b[${rng.nextInt(3)}]')",
            s"json_extract_string($jj, '/c/d')",
            s"($jj -> 'c' ->> 'd')",
            s"($jj ->> '${pick(rng, Seq("a", "b", "c"))}')"))
        case 0 => s"regexp_extract(${leaf(TS)}, ${pick(rng, RegexPats)}, ${rng.nextInt(2)})"
        case 1 => s"regexp_replace(${leaf(TS)}, ${pick(rng, RegexPats)}, ${pick(rng, RegexReps)})"
        case 2 => s"regexp_replace(${leaf(TS)}, ${pick(rng, RegexPats)}, ${pick(rng, RegexReps)}, 'g')"
        case 3 => s"format('${pick(rng, Seq("{}", "{:>6}", "{:<6}", "{:^7}", "[{}]"))}', ${leaf(pick(rng, Seq(TI, TS)))})"
        case 4 =>
          // DuckDB's printf is type-checked: %s with an int is a loud
          // Invalid Input Error there — pair specifiers with their types
          val f = pick(rng, Seq("%d", "%5d", "%s|", "%x"))
          s"printf('$f', ${leaf(if (f == "%s|") TS else TI)})"
        case 5 => s"chr(${65 + rng.nextInt(26)})"
        case 6 => s"md5(${leaf(TS)})"
        case 7 => s"(${j} ->> '${pick(rng, Seq("a", "e", "zz"))}')"
        case 8 => s"json_extract_string(${j}, '$$.c.d')"
        case 9 => s"json_type(${j})"
        case 10 => s"concat_ws('${pick(rng, Seq("-", "", ","))}', ${leaf(TS)}, ${leaf(TS)}, ${leaf(TS)})"
        case 11 => pick(rng, Seq(
          s"(string_split(${leaf(TS)}, ','))[${1 + rng.nextInt(2)}]",
          // implicit-cast concat: DuckDB stringifies the numeric side
          s"(${leaf(TI)} || ${leaf(TS)})",
          s"(${leaf(TS)} || ${leaf(TI)})"))
        case 12 => s"({'a': ${leaf(TI)}, 'b': ${leaf(TS)}}).b"
        case _ => s"${pick(rng, Seq("to_hex", "to_base64"))}(${pick(rng, Seq("42", "0", "255", "'ab'"))})"
      }
      case TB => rng.nextInt(5) match {
        case 0 => s"(${leaf(TS)} ILIKE ${pick(rng, Seq("'A%'", "'%B%'", "'_b%'"))})"
        case 1 => s"regexp_matches(${leaf(TS)}, ${pick(rng, RegexPats)})"
        case 2 => s"json_valid(${pick(rng, Seq(j, "'{'", "'null'"))})"
        case 3 => s"(${leaf(TS)} ${if (rng.nextBoolean()) "" else "NOT "}BETWEEN ${lit(rng, TS)} AND ${lit(rng, TS)})"
        case _ => s"(${leaf(TI)} ${pick(rng, Seq("=", "<>"))} ANY (SELECT * FROM (VALUES (1), (2), (NULL)) q(x)))"
      }
      case other => expr(rng, other, 2)
    }
  }

  /** v4 query shells: HAVING/FILTER aggregates, GROUPING SETS/ROLLUP/
    * CUBE, DISTINCT ON / QUALIFY / ORDER BY ALL, CTE pipelines. */
  def genQueryV4(rng: Random): String = {
    val rel = valuesRelation(rng)
    rng.nextInt(10) match {
      case 8 =>
        // v6: expression GROUP BY keys (NULL keys group together on
        // both engines)
        s"SELECT (i % 3) AS g, count(*) AS c, sum(coalesce(i, 0)) AS s, " +
          s"${pick(rng, Seq("min(d)", "max(s)", "count(d)"))} AS m " +
          s"FROM $rel GROUP BY (i % 3) ORDER BY g NULLS LAST"
      case 9 =>
        if (rng.nextBoolean()) {
          // v6: set-op + ORDER BY + LIMIT/OFFSET shell
          val a = keyedRelation(rng, keyNulls = true)
          val b = keyedRelation(rng, keyNulls = true)
          val op = pick(rng, Seq("UNION ALL", "UNION", "EXCEPT", "INTERSECT"))
          s"SELECT v FROM (SELECT v FROM $a t(id, v) $op SELECT w FROM $b s(id, w)) z " +
            s"ORDER BY v NULLS LAST LIMIT ${2 + rng.nextInt(5)} OFFSET ${rng.nextInt(3)}"
        } else
          // v6: nested windows (window over a windowed subquery)
          s"SELECT rn, r, sum(r) OVER (ORDER BY rn) AS s2 FROM " +
            s"(SELECT rn, rank() OVER (ORDER BY coalesce(i, -99), rn) AS r FROM $rel) z " +
            s"ORDER BY rn"
      case 0 | 1 =>
        // extended aggregates + HAVING + FILTER(WHERE)
        val aggs = (1 to 3).map { jx =>
          val a = rng.nextInt(10) match {
            case 0 => s"round(stddev_samp(${pick(rng, Seq("i", "d"))}), 6)"
            case 1 => s"round(var_samp(${pick(rng, Seq("i", "d"))}), 6)"
            case 2 => s"round(median(d), 6)"
            case 3 => s"round(quantile_cont(d, ${pick(rng, Seq("0.25", "0.5", "0.9"))}), 6)"
            case 4 => s"arg_${pick(rng, Seq("min", "max"))}(${pick(rng, Seq("i", "d", "s"))}, rn)"
            case 5 => s"sum(i) FILTER (WHERE ${expr(rng, TB, 1, RelCols)})"
            case 6 => s"count(*) FILTER (WHERE ${expr(rng, TB, 1, RelCols)})"
            case 7 => s"round(corr(d, i), 6)"
            case 8 => pick(rng, Seq(
              "round(covar_samp(d, i), 6)", "round(covar_pop(d, i), 6)",
              "round(var_pop(d), 6)", "round(stddev_pop(d), 6)",
              // regr_* degenerate groups verified IDENTICAL on both
              // engines (n=1 / zero-variance -> NULL; sxx/syy/sxy 0.0)
              "round(regr_slope(d, i), 6)", "round(regr_intercept(d, i), 6)",
              "round(regr_r2(d, i), 6)", "regr_count(d, i)",
              "round(regr_sxx(d, i), 6)", "round(regr_avgx(d, i), 6)",
              s"bit_${pick(rng, Seq("and", "or", "xor"))}(i)"))
            case _ => pick(rng, Seq("round(skewness(d), 6)", "round(kurtosis(d), 6)",
              "round(geomean(abs(d) + 1.0), 6)", "product(CASE WHEN i % 3 = 0 THEN 2 ELSE 1 END)"))
          }
          s"$a AS a$jx"
        }
        val having = pick(rng, Seq("count(*) >= 1", "count(*) > 1",
          "sum(i) IS NOT NULL", "min(rn) >= 0", "max(rn) < 100"))
        s"SELECT k, ${aggs.mkString(", ")} FROM $rel GROUP BY k HAVING $having ORDER BY k NULLS LAST"
      case 2 =>
        val spec = pick(rng, Seq("GROUPING SETS ((k, s), (k), ())",
          "GROUPING SETS ((k), (s))", "ROLLUP (k, s)", "CUBE (k, s)"))
        s"SELECT k, s, GROUPING(k) AS gk, GROUPING(s) AS gs, count(*) AS c, sum(i) AS si " +
          s"FROM $rel GROUP BY $spec " +
          s"ORDER BY gk, gs, k NULLS LAST, s NULLS LAST, c, si NULLS LAST"
      case 3 =>
        s"SELECT DISTINCT ON (k) k, rn, i, d FROM $rel ORDER BY k NULLS LAST, rn"
      case 4 =>
        val pred = pick(rng, Seq(
          "row_number() OVER (PARTITION BY k ORDER BY rn) <= 2",
          "rank() OVER (ORDER BY k NULLS LAST, rn) <= 4",
          "sum(coalesce(i, 0)) OVER (PARTITION BY k ORDER BY rn) >= 0"))
        s"SELECT rn, k, i FROM $rel QUALIFY $pred ORDER BY rn"
      case 5 =>
        s"SELECT k, count(*) AS c, ${pick(rng, Seq("min(i)", "max(s)", "sum(i)"))} AS m " +
          s"FROM $rel GROUP BY ALL ORDER BY ALL"
      case 6 =>
        // chained CTE pipeline: agg CTE joined back to the base
        s"WITH base AS (SELECT * FROM $rel), " +
          s"agg AS (SELECT k, ${pick(rng, Seq("sum(coalesce(i, 0))", "count(i)", "max(rn)"))} AS m FROM base GROUP BY k) " +
          s"SELECT b.rn, b.k, a.m FROM base b JOIN agg a ON b.k = a.k ORDER BY b.rn"
      case _ =>
        // window frame long-tail over the shared relation
        val w = rng.nextInt(8) match {
          case 0 => s"first_value(${pick(rng, Seq("i", "d", "s"))}) OVER (PARTITION BY k ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
          case 1 => s"last_value(${pick(rng, Seq("i", "d"))}) OVER (ORDER BY rn ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)"
          case 2 => s"nth_value(${pick(rng, Seq("i", "s"))}, 2) OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
          case 3 => s"ntile(${2 + rng.nextInt(3)}) OVER (ORDER BY rn)"
          case 4 => s"round(${pick(rng, Seq("percent_rank", "cume_dist"))}() OVER (ORDER BY rn), 6)"
          case 5 => s"sum(coalesce(i, 0)) OVER (ORDER BY rn RANGE BETWEEN ${1 + rng.nextInt(3)} PRECEDING AND CURRENT ROW)"
          case 6 =>
            val cl = pick(rng, Seq("i", "s"))
            val dflt = if (cl == "s") pick(rng, Seq("'zz'", "''", "NULL"))
              else pick(rng, Seq("0", "-1", "NULL"))
            s"lag($cl, ${1 + rng.nextInt(2)}, $dflt) OVER (ORDER BY rn)"
          case _ => pick(rng, Seq(
            s"${pick(rng, Seq("min", "max"))}(${pick(rng, Seq("i", "d", "s"))}) OVER (PARTITION BY k ORDER BY rn)",
            // sample moments + corr under OVER (momentWin rewrite)
            s"round(${pick(rng, Seq("skewness", "kurtosis"))}(d) OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)",
            s"round(corr(d, i) OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)",
            // r14: distinct folds under OVER — integral exact, floating
            // via the canonical-order DOUBLE fold (round to absorb ulp)
            s"sum(DISTINCT ${pick(rng, Seq("i", "k"))}) OVER (PARTITION BY k)",
            s"round(${pick(rng, Seq("sum", "avg"))}(DISTINCT d) OVER (PARTITION BY k), 6)",
            s"count(DISTINCT ${pick(rng, Seq("i", "d", "s"))}) OVER (PARTITION BY k)"))
        }
        s"SELECT rn, k, $w AS w FROM $rel ORDER BY rn NULLS LAST"
    }
  }
}
