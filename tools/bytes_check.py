#!/usr/bin/env python3
"""Encoder-BYTES differ (round-15, verdict r14 ask #5).

Reads the JSONL written by `runMain graft.tools.BytesProbe <out> [n]
[seed]` (raw HTTP response bytes per format, base64) and replays every
SQL in DuckDB, rendering with DuckDB's OWN machinery:

  csv    COPY (sql) TO tmp (FORMAT CSV, HEADER)
  json   COPY (sql) TO tmp (FORMAT JSON, ARRAY true)
  jsonl  COPY (sql) TO tmp (FORMAT JSON)
  arrow  con.execute(sql).arrow()  (value/schema compare — Arrow IPC
         has no canonical byte framing, so byte-diffing pyarrow's
         serialization against our encoder would only measure framing)

Divergences are classified hierarchically so convention skew cannot
bury real rendering bugs:

  agree_bytes   identical bytes
  layout        equal after CRLF/LF + trailing-newline normalization
  framing       equal cell/token TEXT (csv module / raw JSON number
                tokens preserved via parse_float=str) — quoting or
                whitespace framing differs, rendered values identical
  rendering     parsed values equal (1e-9 rel tol) but token TEXT
                differs — THE class this tool exists to surface
                (float shortest-round-trip, timestamp text, NULL
                spelling)
  VALUE         parsed values differ — a bug on one side
  http_err      our server returned non-200 where DuckDB serves (or
                vice versa); counted, listed

Exit 1 when any VALUE divergence, else 0. Usage:
  python3 tools/bytes_check.py <bytes.jsonl> [--max-report N]
"""
import base64
import csv
import io
import json
import math
import os
import sys
import tempfile

import duckdb


def norm_newlines(b):
    return b.replace(b"\r\n", b"\n").rstrip(b"\n")


def csv_cells(b):
    text = b.decode("utf-8", errors="replace")
    return [row for row in csv.reader(io.StringIO(text))]


def json_tokens(b, lines=False):
    """Parse keeping raw numeric token text (parse_float/int=str)."""
    text = b.decode("utf-8", errors="replace")
    def parse(s):
        return json.loads(s, parse_float=str, parse_int=str,
                          object_pairs_hook=list)
    if lines:
        return [parse(ln) for ln in text.splitlines() if ln.strip()]
    return parse(text) if text.strip() else None


def values_of(tok):
    """Token tree -> canonical value tree (floats parsed, for the
    rendering-vs-VALUE distinction)."""
    if isinstance(tok, list):
        return [values_of(t) for t in tok]
    if isinstance(tok, tuple):
        return tuple(values_of(t) for t in tok)
    if isinstance(tok, str):
        try:
            f = float(tok)
            return f
        except ValueError:
            return tok
    return tok


def veq(a, b):
    if type(a) is bool or type(b) is bool:
        return a is b or a == b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(veq(x, y) for x, y in zip(a, b))
    return a == b


def _nan_vs_null(a, b):
    """True when the trees differ ONLY where ours is None and duck is
    a NaN/Inf float (the JSON null-for-non-finite reference pin)."""
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_nan_vs_null(x, y) for x, y in zip(a, b))
    if a == b:
        return True
    if a is None:
        try:
            f = float(b)
            return math.isnan(f) or math.isinf(f)
        except (TypeError, ValueError):
            return False
    # token-text differences with equal values (the rendering class)
    # also pass through here so mixed rows classify as nan_vs_null
    # only when every remaining diff is the nan shape
    try:
        return veq(values_of(a), values_of(b))
    except RecursionError:
        return False


def duck_copy(con, sql, fmt):
    fd, path = tempfile.mkstemp(suffix=".out")
    os.close(fd)
    os.unlink(path)
    try:
        con.execute(f"COPY ({sql}) TO '{path}' ({fmt})")
        with open(path, "rb") as f:
            return f.read()
    finally:
        if os.path.exists(path):
            os.unlink(path)


def main():
    path = sys.argv[1]
    max_report = 30
    if "--max-report" in sys.argv:
        max_report = int(sys.argv[sys.argv.index("--max-report") + 1])
    con = duckdb.connect()
    counts = {}
    reports = []

    def bump(cls, fmt, rid, sql, detail=""):
        counts[(fmt, cls)] = counts.get((fmt, cls), 0) + 1
        if cls in ("rendering", "VALUE", "http_err"):
            reports.append((cls, fmt, rid, sql, detail))

    for line in open(path, encoding="utf-8"):
        rec = json.loads(line)
        sql, rid = rec["sql"], rec["id"]
        try:
            con.execute(sql).fetchall()
            duck_ok = True
        except Exception:
            duck_ok = False
        for fmt in ("csv", "json", "jsonl", "arrow"):
            code = rec[fmt]["code"]
            ours = base64.b64decode(rec[fmt]["b64"])
            if not duck_ok or code != 200:
                if duck_ok != (code == 200):
                    bump("http_err", fmt, rid, sql,
                         f"ours={code} duck_ok={duck_ok}")
                else:
                    bump("both_err", fmt, rid, sql)
                continue
            if fmt == "arrow":
                try:
                    import datetime
                    import pyarrow.ipc as ipc
                    table = ipc.open_stream(io.BytesIO(ours)).read_all()
                    dtab = con.execute(sql).arrow()

                    def norm_cell(x):
                        # Spark timestamps are tz-aware instants (arrow
                        # type timestamp[us, UTC]); DuckDB's are naive.
                        # Session tz is UTC on both — compare wall time
                        # (documented convention class, not a value bug).
                        if isinstance(x, datetime.datetime) and x.tzinfo:
                            return x.replace(tzinfo=None)
                        import decimal
                        # decimal-vs-double WIDTH (the documented type
                        # mapping): compare numerically
                        if isinstance(x, decimal.Decimal):
                            return float(x)
                        if isinstance(x, list):
                            return [norm_cell(e) for e in x]
                        return values_of(x)
                    ov = [[norm_cell(x) for x in col]
                          for col in table.to_pydict().values()]
                    dv = [[norm_cell(x) for x in col]
                          for col in dtab.to_pydict().values()]
                    names_ok = table.column_names == dtab.column_names
                    if veq(ov, dv) and names_ok:
                        bump("agree_values", fmt, rid, sql)
                    else:
                        bump("VALUE", fmt, rid, sql,
                             f"names_ok={names_ok} ours={str(ov)[:120]} duck={str(dv)[:120]}")
                except Exception as e:
                    bump("VALUE", fmt, rid, sql, f"arrow parse: {e}")
                continue
            dfmt = {"csv": "FORMAT CSV, HEADER",
                    "json": "FORMAT JSON, ARRAY true",
                    "jsonl": "FORMAT JSON"}[fmt]
            try:
                duck = duck_copy(con, sql, dfmt)
            except Exception as e:
                bump("http_err", fmt, rid, sql, f"duck COPY err: {e}")
                continue
            if ours == duck:
                bump("agree_bytes", fmt, rid, sql)
                continue
            if norm_newlines(ours) == norm_newlines(duck):
                bump("layout", fmt, rid, sql)
                continue
            try:
                if fmt == "csv":
                    ot, dt = csv_cells(ours), csv_cells(duck)
                else:
                    ot = json_tokens(ours, lines=(fmt == "jsonl"))
                    dt = json_tokens(duck, lines=(fmt == "jsonl"))
            except Exception as e:
                bump("VALUE", fmt, rid, sql, f"parse: {e}")
                continue
            if ot == dt:
                bump("framing", fmt, rid, sql)
            elif fmt in ("json", "jsonl") and _nan_vs_null(ot, dt):
                # the reference's JSON encoder (our pinned golden)
                # renders NaN/Inf as null — JSON has no NaN literal —
                # while DuckDB's COPY JSON emits a bare NaN token.
                # Documented convention class, not a value bug.
                bump("nan_vs_null", fmt, rid, sql)
            elif veq(values_of(ot), values_of(dt)):
                # find the first token-text difference for the ledger
                detail = ""
                def first_diff(a, b, path="$"):
                    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)) \
                            and len(a) == len(b):
                        for i, (x, y) in enumerate(zip(a, b)):
                            d = first_diff(x, y, f"{path}[{i}]")
                            if d:
                                return d
                        return None
                    if a != b:
                        return f"{path}: ours={a!r} duck={b!r}"
                    return None
                detail = first_diff(ot, dt) or "?"
                bump("rendering", fmt, rid, sql, detail)
            else:
                bump("VALUE", fmt, rid, sql,
                     f"ours={str(ot)[:120]} duck={str(dt)[:120]}")

    print("== bytes_check summary ==")
    for (fmt, cls), v in sorted(counts.items()):
        print(f"  {fmt:6s} {cls:12s} {v}")
    by_class = {}
    for cls, fmt, rid, sql, detail in reports:
        by_class.setdefault(cls, []).append((fmt, rid, sql, detail))
    for cls in ("VALUE", "rendering", "http_err"):
        items = by_class.get(cls, [])
        if not items:
            continue
        print(f"\n== {cls} ({len(items)}) ==")
        for fmt, rid, sql, detail in items[:max_report]:
            print(f"[{rid}/{fmt}] {sql[:180]}\n     {detail[:260]}")
    n_value = sum(v for (f, c), v in counts.items() if c == "VALUE")
    sys.exit(1 if n_value else 0)


if __name__ == "__main__":
    main()
