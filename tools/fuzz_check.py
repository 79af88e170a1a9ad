#!/usr/bin/env python3
"""Differ for the FuzzProbe sweep (round-13 verdict ask #1).

Reads the JSONL written by `runMain graft.tools.FuzzProbe <out> [n]
[seed]`, replays every generated SQL text in python3-duckdb, and diffs
the results with the same discipline tools/check.py uses:

  - both sides error        -> agree (loud-on-both; counted, not listed)
  - value mismatch          -> VALUE divergence (the gold — silent wrong)
  - shape mismatch          -> SHAPE divergence (row/col count)
  - Spark errs, DuckDB ok   -> SPARK_ERR (loud-where-duck-works; the
                               codebase's loud-beats-wrong policy makes
                               these acceptable but worth a scan)
  - DuckDB errs, Spark ok   -> DUCK_ERR (generator out of the DuckDB
                               grammar, or we accept what DuckDB rejects)

Float compare: 1e-9 relative tolerance (pow/exp/agg-order are ~1-ulp
engine-dependent); NaN == NaN; -0.0 == 0.0 is NOT forgiven (probe-26
pinned signbit semantics) except through the integral rendering which
both sides share.

Usage: python3 tools/fuzz_check.py <fuzz.jsonl> [--max-report N]
Exit 0 when no VALUE/SHAPE divergences, 1 otherwise.
"""
import sys, json, math
import duckdb


def norm(v):
    """DuckDB value -> the canonical form FuzzProbe.renderVal emits."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e15:
            # integral doubles render width-free (4.0 == 4); keep -0.0
            if v == 0 and math.copysign(1.0, v) < 0:
                return "-0.0"
            return int(v)
        return v
    if isinstance(v, int):
        return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return norm(float(v))
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return [norm(x) for x in v]
    if isinstance(v, dict):
        return sorted([[norm(k), norm(x)] for k, x in v.items()],
                      key=lambda e: str(e))
    return str(v)


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, str) and a == "-0.0":
        a = 0
    if isinstance(b, str) and b == "-0.0":
        b = 0
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
            and not isinstance(a, bool) and not isinstance(b, bool):
        fa, fb = float(a), float(b)
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return (type(a) is bool) == (type(b) is bool) and str(a) == str(b)


def rows_eq(a, b):
    if len(a) != len(b):
        return False
    return all(len(x) == len(y) and all(eq(u, v) for u, v in zip(x, y))
               for x, y in zip(a, b))


def main():
    path = sys.argv[1]
    max_report = 40
    if "--max-report" in sys.argv:
        max_report = int(sys.argv[sys.argv.index("--max-report") + 1])
    con = duckdb.connect()
    # grammar v7: --sf <dir> registers the same parquet fixtures the
    # FuzzProbe relational sweep ran over as DuckDB views
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
        for t in ("lineitem", "orders", "customer", "events", "documents",
                  "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    # grammar v9: --nested <dir> registers the Spark-materialized nested
    # parquet fixture (target/fuzz_nested) so DuckDB reads the SAME
    # nested files the sweep ran over
    if "--nested" in sys.argv:
        nd = sys.argv[sys.argv.index("--nested") + 1]
        con.execute(
            f"CREATE VIEW nested AS SELECT * FROM '{nd}/*.parquet'")
    counts = {"agree": 0, "both_err": 0, "VALUE": 0, "SHAPE": 0,
              "SPARK_ERR": 0, "DUCK_ERR": 0}
    reports = []
    for line in open(path, encoding="utf-8"):
        rec = json.loads(line)
        sql = rec["sql"]
        try:
            duck = [[norm(v) for v in row]
                    for row in con.execute(sql).fetchall()]
            duck_ok = True
        except Exception as e:
            duck_ok, duck_err = False, str(e).split("\n")[0][:200]
        if rec["ok"] and duck_ok:
            spark_rows = rec["rows"]
            if len(spark_rows) != len(duck) or (
                    spark_rows and duck and
                    len(spark_rows[0]) != len(duck[0])):
                counts["SHAPE"] += 1
                reports.append(("SHAPE", rec["id"], sql,
                                f"spark {len(spark_rows)}r duck {len(duck)}r"))
            elif rows_eq(spark_rows, duck):
                counts["agree"] += 1
            else:
                counts["VALUE"] += 1
                diff = ""
                for ri, (sr, dr) in enumerate(zip(spark_rows, duck)):
                    for ci, (sv, dv) in enumerate(zip(sr, dr)):
                        if not eq(sv, dv):
                            col = (rec.get("cols") or [])[ci] \
                                if ci < len(rec.get("cols") or []) else ci
                            diff = f"row {ri} col {col}: spark={sv!r} duck={dv!r}"
                            break
                    if diff:
                        break
                reports.append(("VALUE", rec["id"], sql, diff))
        elif rec["ok"] and not duck_ok:
            counts["DUCK_ERR"] += 1
            reports.append(("DUCK_ERR", rec["id"], sql, duck_err))
        elif not rec["ok"] and duck_ok:
            counts["SPARK_ERR"] += 1
            reports.append(("SPARK_ERR", rec["id"], sql, rec["err"][:160]))
        else:
            counts["both_err"] += 1
    print("== fuzz_check summary ==")
    for k, v in counts.items():
        print(f"  {k:10s} {v}")
    by_class = {}
    for cls, rid, sql, detail in reports:
        by_class.setdefault(cls, []).append((rid, sql, detail))
    for cls in ("VALUE", "SHAPE", "SPARK_ERR", "DUCK_ERR"):
        items = by_class.get(cls, [])
        if not items:
            continue
        print(f"\n== {cls} ({len(items)}) ==")
        for rid, sql, detail in items[:max_report]:
            print(f"[{rid}] {sql[:220]}\n     {detail}")
    sys.exit(1 if counts["VALUE"] or counts["SHAPE"] else 0)


if __name__ == "__main__":
    main()
