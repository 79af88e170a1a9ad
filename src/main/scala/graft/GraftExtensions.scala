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
    ("graft_slice",
      info("graft_slice", "graft_slice(x, a, b) - DuckDB bracket slice x[a:b]: 1-based end-inclusive, negative-from-end, on strings and lists."),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"graft_slice expects 3 arguments, got ${args.length}")
        graft.functions.SliceDispatch(args.head, args(1), args(2))
      }),
    ("graft_at",
      info("graft_at", "graft_at(x, i) - DuckDB bracket access x[i] on strings, lists and maps."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_at expects 2 arguments, got ${args.length}")
        graft.functions.AtDispatch(args.head, args(1))
      }),
    ("list_slice",
      info("list_slice", "list_slice(l, a, b) - DuckDB list slice (1-based, end-inclusive, negative-from-end)."),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"list_slice expects 3 arguments, got ${args.length}")
        graft.functions.SliceDispatch(args.head, args(1), args(2))
      }),
    ("epoch_ms",
      info("epoch_ms", "epoch_ms(x) - BIGINT ms->TIMESTAMP or TIMESTAMP->BIGINT ms (DuckDB's overloads)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"epoch_ms expects 1 argument, got ${args.length}")
        graft.functions.EpochMsDispatch(args.head)
      }),
    // DuckDB's epoch family (verified against DuckDB 1.x): epoch →
    // DOUBLE seconds with fractional µs, epoch_us/epoch_ns → BIGINT.
    // Spark's unix_* split these by unit and don't accept DATE, so
    // each casts through TIMESTAMP first.
    ("epoch",
      info("epoch", "epoch(ts) - DOUBLE seconds since epoch (fractional microseconds, DuckDB semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"epoch expects 1 argument, got ${args.length}")
        import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Literal, UnixMicros}
        Divide(Cast(UnixMicros(Cast(args.head, org.apache.spark.sql.types.TimestampType)),
          org.apache.spark.sql.types.DoubleType), Literal(1e6))
      }),
    ("epoch_us",
      info("epoch_us", "epoch_us(ts) - BIGINT microseconds since epoch."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"epoch_us expects 1 argument, got ${args.length}")
        import org.apache.spark.sql.catalyst.expressions.{Cast, UnixMicros}
        UnixMicros(Cast(args.head, org.apache.spark.sql.types.TimestampType))
      }),
    ("epoch_ns",
      info("epoch_ns", "epoch_ns(ts) - BIGINT nanoseconds since epoch (µs-precision input × 1000)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"epoch_ns expects 1 argument, got ${args.length}")
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Multiply, UnixMicros}
        Multiply(UnixMicros(Cast(args.head, org.apache.spark.sql.types.TimestampType)),
          Literal(1000L))
      }),
    // DuckDB's len dispatches on argument type: chars for strings,
    // cardinality for lists (the divergence that kept `len` out of the
    // plain-alias table until now)
    ("len",
      info("len", "len(x) - characters of a string or cardinality of a list (DuckDB's type dispatch)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"len expects 1 argument, got ${args.length}")
        graft.functions.LenDispatch(args.head)
      }),
    // DuckDB's list_append/list_prepend/list_concat treat a NULL list
    // as empty (verified: list_append(NULL, 3) = [3], list_prepend(1,
    // NULL) = [1], list_concat([1], NULL) = [1]) — and list_prepend
    // takes (element, list), the REVERSE of Spark's array_prepend.
    // Only a both-NULL list_concat stays NULL.
    ("list_append",
      info("list_append", "list_append(list, e) - append with DuckDB's NULL-list-as-empty semantics."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"list_append expects 2 arguments, got ${args.length}")
        builtinBuilder("array_append")(Seq(coalesceEmptyArray(args.head), args(1)))
      }),
    ("list_prepend",
      info("list_prepend", "list_prepend(e, list) - DuckDB argument order; NULL list treated as empty."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"list_prepend expects 2 arguments, got ${args.length}")
        builtinBuilder("array_prepend")(Seq(coalesceEmptyArray(args(1)), args.head))
      }),
    ("list_concat",
      info("list_concat", "list_concat(a, b) - concat skipping NULL sides; NULL only when both are NULL."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"list_concat expects 2 arguments, got ${args.length}")
        import org.apache.spark.sql.catalyst.expressions.{And, IsNull, Literal}
        builtinBuilder("if")(Seq(
          And(IsNull(args.head), IsNull(args(1))),
          Literal.create(null, org.apache.spark.sql.types.NullType),
          builtinBuilder("concat")(Seq(
            coalesceEmptyArray(args.head), coalesceEmptyArray(args(1))))))
      }),
    // DuckDB list_aggregate + the list_sum/avg/min/max shorthands:
    // NULL elements skipped, empty/all-NULL lists → NULL (count → 0),
    // dispatched on the resolved element type (ListAggregateDispatch)
    ("list_aggregate",
      info("list_aggregate", "list_aggregate(list, 'fn') - reduce a list with min/max/count/sum/avg (DuckDB NULL semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"list_aggregate expects 2 arguments, got ${args.length}")
        graft.functions.ListAggregateDispatch(args.head, args(1))
      }),
    ("list_sum",
      info("list_sum", "list_sum(list) - sum of non-NULL elements; NULL when none."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"list_sum expects 1 argument, got ${args.length}")
        graft.functions.ListAggregateDispatch(args.head, strLit("sum"))
      }),
    ("list_avg",
      info("list_avg", "list_avg(list) - mean of non-NULL elements; NULL when none."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"list_avg expects 1 argument, got ${args.length}")
        graft.functions.ListAggregateDispatch(args.head, strLit("avg"))
      }),
    ("list_min",
      info("list_min", "list_min(list) - minimum non-NULL element."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"list_min expects 1 argument, got ${args.length}")
        graft.functions.ListAggregateDispatch(args.head, strLit("min"))
      }),
    ("list_max",
      info("list_max", "list_max(list) - maximum non-NULL element."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"list_max expects 1 argument, got ${args.length}")
        graft.functions.ListAggregateDispatch(args.head, strLit("max"))
      }),
    // DuckDB string_split treats the separator as a LITERAL (Spark's
    // split is regex), splits per character on an empty separator, and
    // returns [''] for an empty input (verified against DuckDB 1.x) —
    // composed here from StringSplitSQL (Spark's literal-delimiter
    // kernel) plus the two edge fixes. A NON-literal separator that is
    // empty at runtime is the one uncovered edge (returns the whole
    // string unsplit); DuckDB usage is overwhelmingly literal.
    ("string_split", stringSplitInfo("string_split"), stringSplitBuilder("string_split")),
    ("str_split", stringSplitInfo("str_split"), stringSplitBuilder("str_split")),
    ("string_to_array", stringSplitInfo("string_to_array"), stringSplitBuilder("string_to_array")),
    // DuckDB strftime/strptime speak C/Python %-directives while Spark
    // speaks JDK DateTimeFormatter patterns — a plain alias would
    // silently misread every format string, so the format literal is
    // TRANSLATED at registration (bind) time and unsupported
    // directives fail loudly. Rendering/parsing then runs through the
    // codegen'd builtins (date_format / to_timestamp).
    ("strftime",
      info("strftime", "strftime(ts, '%Y-%m-%d') - DuckDB C-style timestamp formatting."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"strftime expects 2 arguments, got ${args.length}")
        builtinBuilder("date_format")(Seq(args.head, translatedFormat("strftime", args(1))))
      }),
    ("strptime",
      info("strptime", "strptime(s, '%Y-%m-%d') - DuckDB C-style timestamp parsing."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"strptime expects 2 arguments, got ${args.length}")
        builtinBuilder("to_timestamp")(Seq(args.head, translatedFormat("strptime", args(1))))
      }),
    // NOT a plain alias: DuckDB's list_distinct also drops NULL
    // elements, Spark's array_distinct keeps one — compose the null
    // filter explicitly so the alias matches DuckDB bit-for-bit.
    ("list_distinct",
      info("list_distinct", "list_distinct(arr) - distinct non-NULL elements (DuckDB semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"list_distinct expects 1 argument, got ${args.length}")
        distinctNonNull(args.head)
      }),
    // DuckDB list_unique COUNTS distinct non-NULL elements (verified:
    // list_unique([1,1,NULL,2,NULL]) = 2) — it is not a dedup'd list
    ("list_unique",
      info("list_unique", "list_unique(arr) - COUNT of distinct non-NULL elements (DuckDB semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"list_unique expects 1 argument, got ${args.length}")
        builtinBuilder("cardinality")(Seq(distinctNonNull(args.head)))
      }),
    // descending sort with NULLs last, like DuckDB's (sort_array desc
    // places NULLs last; array_sort covers the ascending alias)
    ("list_reverse_sort",
      info("list_reverse_sort", "list_reverse_sort(arr) - descending sort, NULLs last (DuckDB semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"list_reverse_sort expects 1 argument, got ${args.length}")
        builtinBuilder("sort_array")(Seq(args.head,
          org.apache.spark.sql.catalyst.expressions.Literal(false)))
      }),
    // DuckDB quantile_disc: the element at index ceil(p·n) of the
    // sorted non-NULL values (verified: p=0 → first, p=1 → last, works
    // on any orderable type). Composed from builtins — the group is
    // collected to an array, which is the shim-layer trade-off; the
    // library's own quantile queries use percentile/approx instead.
    ("quantile_disc",
      info("quantile_disc", "quantile_disc(x, p) - exact discrete quantile (DuckDB semantics)."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"quantile_disc expects 2 arguments, got ${args.length}")
        import org.apache.spark.sql.catalyst.expressions.{Cast, Multiply}
        // sort_array, not array_sort: the higher-order builder asserts
        // resolved args at bind time; NULL placement is moot because
        // collect_list already skips NULLs (as DuckDB's quantile does).
        // The index derives from count(x) — a second, independent
        // aggregate — because re-referencing the collect_list subtree
        // trips aggregate planning.
        // pre-built aggregate functions must be wrapped explicitly —
        // the analyzer only wraps the ones it resolves itself
        def agg(name: String, in: Expression): Expression =
          builtinBuilder(name)(Seq(in)) match {
            case f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
              f.toAggregateExpression()
            case e => e
          }
        val sorted = builtinBuilder("sort_array")(Seq(
          agg("collect_list", args.head),
          org.apache.spark.sql.catalyst.expressions.Literal(true)))
        val n = agg("count", args.head)
        val idx = builtinBuilder("greatest")(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(1),
          Cast(builtinBuilder("ceil")(Seq(Multiply(
            Cast(args(1), org.apache.spark.sql.types.DoubleType),
            Cast(n, org.apache.spark.sql.types.DoubleType)))),
            org.apache.spark.sql.types.IntegerType)))
        builtinBuilder("try_element_at")(Seq(sorted, idx))
      }),
    // DuckDB's float-accumulator aggregates: fsum/favg force DOUBLE
    // accumulation (Kahan in DuckDB; same value modulo fp order)
    ("fsum",
      info("fsum", "fsum(x) - sum with DOUBLE accumulation (DuckDB's Kahan-summed sumkahan)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"fsum expects 1 argument, got ${args.length}")
        builtinBuilder("sum")(Seq(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DoubleType)))
      }),
    ("favg",
      info("favg", "favg(x) - mean with DOUBLE accumulation."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"favg expects 1 argument, got ${args.length}")
        builtinBuilder("avg")(Seq(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DoubleType)))
      }),
    ("sumkahan",
      info("sumkahan", "sumkahan(x) - sum with DOUBLE accumulation."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"sumkahan expects 1 argument, got ${args.length}")
        builtinBuilder("sum")(Seq(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DoubleType)))
      }),
    // DuckDB format() speaks fmt's {}-placeholders, Spark's
    // format_string speaks printf — translate the (literal) template
    // at bind time; {}, {N}, {:spec} and {N:spec} are covered,
    // exotic fill/align specs fail loudly
    ("format",
      info("format", "format('{}-{}', args...) - DuckDB fmt-style formatting (translated to printf)."),
      (args: Seq[Expression]) => {
        require(args.nonEmpty, "format expects at least the template argument")
        // decimals/floats → double so java's %f accepts them (Spark
        // parses 3.14 literals as DECIMAL, which format_string rejects)
        builtinBuilder("format_string")(
          fmtTemplateToPrintf(args.head) +: args.tail.map(graft.functions.FmtArgCast))
      }),
    // DuckDB regexp_extract/extract_all default to group 0 (the whole
    // match); Spark's default is group 1 — re-register with the
    // DuckDB default, explicit group indexes pass through
    ("regexp_extract",
      info("regexp_extract", "regexp_extract(s, re[, group]) - group defaults to 0 (DuckDB semantics)."),
      (args: Seq[Expression]) => {
        val withIdx = if (args.length == 2)
          args :+ org.apache.spark.sql.catalyst.expressions.Literal(0) else args
        builtinBuilder("regexp_extract")(withIdx)
      }),
    ("regexp_extract_all",
      info("regexp_extract_all", "regexp_extract_all(s, re[, group]) - group defaults to 0 (DuckDB semantics)."),
      (args: Seq[Expression]) => {
        val withIdx = if (args.length == 2)
          args :+ org.apache.spark.sql.catalyst.expressions.Literal(0) else args
        builtinBuilder("regexp_extract_all")(withIdx)
      }),
    // DuckDB date_diff counts unit BOUNDARIES crossed, not elapsed
    // units — a 3-arg call with a (DuckDB-style) quoted unit literal
    // gets the boundary composition; 2-arg datediff and Spark's
    // unquoted-unit date_diff delegate to the builtins
    // Spark's parser special-cases date_diff/datediff and rejects a
    // quoted unit before any registry lookup — the dialect shim
    // renames the quoted-unit spelling to graft_date_diff textually
    ("graft_date_diff", dateDiffInfo("graft_date_diff"), dateDiffBuilder("graft_date_diff")),
    ("time_bucket",
      info("time_bucket", "time_bucket(width, ts[, origin]) - fixed-width buckets aligned to DuckDB's 2000-01-03 / 2000-01-01 origins."),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          s"time_bucket expects 2 or 3 arguments, got ${args.length}")
        graft.functions.TimeBucket(args.head, args(1), args.drop(2).headOption)
      }),
    // DuckDB's JSON extraction, variant-backed so quoting is faithful:
    // json_extract / `->` keep JSON form ('"x"'), json_extract_string /
    // `->>` / json_value unquote scalars. Paths: '$.a[0]' as-is,
    // '/a/b' pointers, bare keys, integer indexes. Malformed JSON
    // yields NULL (try_parse_json) rather than an error.
    ("graft_json_extract", jsonExtractInfo("graft_json_extract"), jsonExtractBuilder(asText = false)),
    ("json_extract", jsonExtractInfo("json_extract"), jsonExtractBuilder(asText = false)),
    ("graft_json_extract_string", jsonExtractInfo("graft_json_extract_string"), jsonExtractBuilder(asText = true)),
    ("json_extract_string", jsonExtractInfo("json_extract_string"), jsonExtractBuilder(asText = true)),
    ("json_value", jsonExtractInfo("json_value"), jsonExtractBuilder(asText = true)),
    // 1-arg trunc is DuckDB's numeric truncation toward zero; the
    // 2-arg date form stays Spark's builtin
    ("trunc",
      info("trunc", "trunc(x) - numeric truncation toward zero; trunc(date, fmt) stays Spark's."),
      (args: Seq[Expression]) => {
        if (args.length == 1) graft.functions.TruncDispatch(args.head)
        else builtinBuilder("trunc")(args)
      }))

  /** `array_distinct(filter(arr, x -> x IS NOT NULL))` — DuckDB's
    * notion of a list's distinct elements (NULLs dropped).
    */
  private def distinctNonNull(arr: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayFilter, IsNotNull, LambdaFunction, UnresolvedNamedLambdaVariable}
    val v = UnresolvedNamedLambdaVariable(Seq("__ld_x"))
    ArrayDistinct(ArrayFilter(arr, LambdaFunction(IsNotNull(v), Seq(v))))
  }

  /** DuckDB/fmt `{}` template literal → printf template literal.
    * `{}` → `%s` (auto-indexed), `{2}` → `%3$s`, `{:.2f}` → `%.2f`,
    * `{1:5d}` → `%2$5d`; `{{`/`}}` escape braces. Width/precision/
    * d-f-s-x-o-e-g types map 1:1; fill/align/sign specs fail loudly.
    */
  private[graft] def fmtTemplateToPrintf(e: Expression): Expression = {
    require(e.foldable, "format: the template must be a string literal")
    val raw = e.eval(null) match {
      case null => throw new IllegalArgumentException("format: template is NULL")
      case u => u.toString
    }
    val out = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '{' && i + 1 < raw.length && raw.charAt(i + 1) == '{') { out.append('{'); i += 2 }
      else if (c == '}' && i + 1 < raw.length && raw.charAt(i + 1) == '}') { out.append('}'); i += 2 }
      else if (c == '%') { out.append("%%"); i += 1 }
      else if (c == '{') {
        val close = raw.indexOf('}', i)
        require(close >= 0, s"format: unbalanced '{' in template: $raw")
        val body = raw.substring(i + 1, close)
        val (idxPart, specPart) = body.indexOf(':') match {
          case -1 => (body, "")
          case k  => (body.substring(0, k), body.substring(k + 1))
        }
        val pos =
          if (idxPart.isEmpty) ""
          else {
            require(idxPart.forall(_.isDigit), s"format: unsupported placeholder {$body}")
            s"${idxPart.toInt + 1}$$"
          }
        val conv =
          if (specPart.isEmpty) "s"
          else {
            // [width][.precision][type] — anything fancier fails loudly
            val m = "^(\\d*)(\\.\\d+)?([dfsxoeg]?)$".r
            specPart match {
              case m(w, p, t) =>
                val ty = if (t.isEmpty) "s" else t
                s"$w${Option(p).getOrElse("")}$ty"
              case _ => throw new IllegalArgumentException(
                s"format: unsupported format spec {$body} (width/.precision/dfsxoeg only)")
            }
          }
        out.append('%').append(pos).append(conv)
        i = close + 1
      } else { out.append(c); i += 1 }
    }
    strLit(out.toString)
  }

  private def strLit(s: String): Expression =
    org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)

  private def jsonExtractInfo(name: String): ExpressionInfo =
    info(name, s"$name(json, path) - DuckDB JSON extraction ('$$.a', '/a/b', key or index paths).")

  /** DuckDB path spellings → Spark variant paths, at bind time (the
    * path argument is a literal in all DuckDB usage; non-literals fail
    * loudly rather than risking per-row mistranslation).
    */
  private def jsonPathLiteral(e: Expression): Expression = {
    require(e.foldable, "json path must be a literal")
    val v = e.eval(null)
    require(v != null, "json path is NULL")
    val path = e.dataType match {
      case t if t.isInstanceOf[org.apache.spark.sql.types.StringType] =>
        val s = v.toString
        if (s.startsWith("$")) s
        else if (s.startsWith("/"))
          "$" + s.split('/').filter(_.nonEmpty).map { seg =>
            if (seg.forall(_.isDigit)) s"[$seg]" else s".$seg"
          }.mkString
        else "$." + s
      case _ => s"$$[$v]" // integer index (DuckDB: 0-based, like variant)
    }
    strLit(path)
  }

  private def jsonExtractBuilder(asText: Boolean): Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      require(args.length == 2, s"json extraction expects 2 arguments, got ${args.length}")
      val parsed = builtinBuilder("try_parse_json")(Seq(args.head))
      val path = jsonPathLiteral(args(1))
      if (asText)
        builtinBuilder("variant_get")(Seq(parsed, path, strLit("string")))
      else
        builtinBuilder("to_json")(Seq(builtinBuilder("variant_get")(Seq(parsed, path))))
    }

  private def dateDiffInfo(name: String): ExpressionInfo =
    info(name, s"$name('unit', start, end) - DuckDB boundary-crossing date difference (BIGINT).")

  private def dateDiffBuilder(name: String): Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      val quotedUnit = args.length == 3 && args.head.foldable &&
        args.head.dataType.isInstanceOf[org.apache.spark.sql.types.StringType] &&
        args.head.eval(null) != null
      if (quotedUnit)
        graft.functions.BoundaryDateDiff(args.head.eval(null).toString, args(1), args(2))
      else builtinBuilder("datediff")(args)
    }

  private def stringSplitInfo(name: String): ExpressionInfo =
    info(name, s"$name(s, sep) - split on a LITERAL separator (DuckDB semantics; '' splits per character).")

  private def stringSplitBuilder(name: String): Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      import org.apache.spark.sql.catalyst.expressions.{CreateArray, EqualTo, If, StringSplitSQL}
      val emptyLiteralSep = args(1).foldable && {
        val v = args(1).eval(null); v != null && v.toString.isEmpty
      }
      if (emptyLiteralSep)
        builtinBuilder("split")(Seq(args.head, strLit(""))) // per-char, like DuckDB
      else
        If(EqualTo(args.head, strLit("")),
          CreateArray(Seq(strLit(""))), // DuckDB: string_split('', sep) = ['']
          StringSplitSQL(args.head, args(1)))
    }

  /** `coalesce(list, array())` — renders DuckDB's NULL-list-as-empty
    * convention; the analyzer's type coercion widens the empty
    * array<null> literal to the list's element type.
    */
  private def coalesceEmptyArray(e: Expression): Expression =
    builtinBuilder("coalesce")(Seq(e,
      org.apache.spark.sql.catalyst.expressions.CreateArray(Nil)))

  private def builtinBuilder(name: String): Seq[Expression] => Expression =
    org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
      .lookupFunctionBuilder(FunctionIdentifier(name))
      .getOrElse(throw new IllegalStateException(s"builtin $name not found"))

  /** The format argument as a translated JDK-pattern literal. DuckDB
    * usage is overwhelmingly a string literal; non-foldable formats
    * fail loudly rather than risking a per-row mistranslation.
    */
  private def translatedFormat(fn: String, e: Expression): Expression = {
    require(e.foldable, s"$fn: the format argument must be a string literal")
    val raw = e.eval(null) match {
      case null => throw new IllegalArgumentException(s"$fn: format is NULL")
      case u => u.toString
    }
    org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(cFormatToJava(fn, raw)),
      org.apache.spark.sql.types.StringType)
  }

  /** C/Python strftime directives → JDK DateTimeFormatter patterns.
    * Literal runs are single-quoted so pattern letters in plain text
    * can't activate; `%-d`-style no-pad variants map to the single
    * letter; directives whose semantics Spark can't reproduce exactly
    * (locale week numbers, %U/%W/%w, timezone names) throw — an
    * unknown-directive error beats a silently shifted date.
    */
  private[graft] def cFormatToJava(fn: String, fmt: String): String = {
    val sb = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      sb.append("'").append(lit.toString.replace("'", "''")).append("'")
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        var j = i + 1
        val dash = fmt.charAt(j) == '-'
        if (dash && j + 1 < fmt.length) j += 1
        val d = fmt.charAt(j)
        d match {
          case '%' => lit.append('%')
          case 'n' => lit.append('\n')
          case 't' => lit.append('\t')
          case _ =>
            val mapped = (d, dash) match {
              case ('a', _) => "EEE"
              case ('A', _) => "EEEE"
              case ('b', _) | ('h', _) => "MMM"
              case ('B', _) => "MMMM"
              case ('d', false) => "dd"
              case ('d', true) | ('e', _) => "d"
              case ('f', _) => "SSSSSS" // microseconds
              case ('g', _) => "SSS"    // DuckDB: milliseconds
              case ('H', false) => "HH"
              case ('H', true) => "H"
              case ('I', false) => "hh"
              case ('I', true) => "h"
              case ('j', _) => "DDD"
              case ('m', false) => "MM"
              case ('m', true) => "M"
              case ('M', false) => "mm"
              case ('M', true) => "m"
              case ('p', _) => "a"
              case ('S', false) => "ss"
              case ('S', true) => "s"
              case ('y', _) => "yy"
              case ('Y', _) => "yyyy"
              case (other, _) => throw new IllegalArgumentException(
                s"$fn: unsupported directive %$other (supported: %a %A %b %B %d %e %f %g %H %I %j %m %M %p %S %y %Y %% %n %t and %- no-pad variants)")
            }
            flush(); sb.append(mapped)
        }
        i = j + 1
      } else { lit.append(c); i += 1 }
    }
    flush()
    sb.toString
  }

  /** DuckDB function-name aliases onto Spark builtins with matching
    * semantics AND argument order — the function-level face of the
    * dialect shim (`server.Dialect` handles the syntax-level sugar).
    * Only same-semantics pairs are aliased; names whose DuckDB
    * behavior differs (string_split literal-vs-regex, engine hash
    * values) are deliberately NOT mapped — a silently-different
    * result is worse than an unknown-function error. (strftime/
    * strptime, len, epoch*, and the list_append/prepend/concat family
    * are handled above as real registrations reproducing DuckDB's
    * type dispatch, argument order and NULL conventions — not plain
    * aliases.)
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
    "regexp_matches" -> "rlike",
    // round-5 long-tail batch, each verified same-semantics vs DuckDB
    // 1.5: list_position (1-based, 0 when absent, NULL on NULL list =
    // array_position exactly), array_length/size (NULL-in-NULL-out),
    // strpos/instr (1-based, 0 absent), prefix/suffix booleans,
    // regexp_split_to_array (both regex-based), today/current_date,
    // gen_random_uuid()/uuid(), unnest in the select list = explode
    // (DuckDB's expression-wrapped unnest stays unsupported — loud)
    "list_position" -> "array_position",
    "list_indexof" -> "array_position",
    "array_length" -> "size",
    "strpos" -> "instr",
    "starts_with" -> "startswith",
    "prefix" -> "startswith",
    "ends_with" -> "endswith",
    "suffix" -> "endswith",
    "regexp_split_to_array" -> "split",
    "today" -> "current_date",
    "get_current_timestamp" -> "now",
    "gen_random_uuid" -> "uuid",
    "uuidv4" -> "uuid",
    "unnest" -> "explode",
    // DuckDB's list(x) aggregate (NULL-keeping there, NULL-skipping
    // here — the same pre-existing divergence as the array_agg alias)
    "list" -> "collect_list")

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

  /** DuckDB's `product(x)` aggregate: multiplies non-NULL doubles,
    * NULL when no values (verified). A typed Aggregator — there is no
    * builtin product, and exp(sum(ln)) breaks on zeros/negatives.
    */
  private object ProductAgg extends org.apache.spark.sql.expressions.Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
    override def zero: (Double, Boolean) = (1.0, false)
    override def reduce(b: (Double, Boolean), a: java.lang.Double): (Double, Boolean) =
      if (a == null) b else (b._1 * a, true)
    override def merge(x: (Double, Boolean), y: (Double, Boolean)): (Double, Boolean) =
      (x._1 * y._1, x._2 || y._2)
    override def finish(r: (Double, Boolean)): java.lang.Double =
      if (r._2) r._1 else null
    override def bufferEncoder: org.apache.spark.sql.Encoder[(Double, Boolean)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaBoolean)
    override def outputEncoder: org.apache.spark.sql.Encoder[java.lang.Double] =
      org.apache.spark.sql.Encoders.DOUBLE
  }

  /** Programmatic registration for an already-built session (the
    * extensions config only applies at session construction).
    * `product` is a typed-Aggregator UDAF, so it registers here (the
    * config-based extensions path carries Expression builders only).
    */
  def injectInto(spark: SparkSession): Unit = {
    allRegistrations.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
    spark.udf.register("product",
      org.apache.spark.sql.functions.udaf(ProductAgg, org.apache.spark.sql.Encoders.DOUBLE))
  }
}
