#!/usr/bin/env python3
"""Local dev replica of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name>/ parquet dump, executes the matching SQL from
<outDir>/oracle_sql.json in DuckDB (tables = views over the same
parquet), canonicalizes both sides (columns sorted by name, rows
sorted), and reports schema/row-count/value match.

Compare modes:
  default    — EXACT (mirrors the driver's hash compare: any rendered
               difference is a FAIL, including integer-type rendering).
  --tolerant — legacy 1e-9-relative float tolerance (dev triage only;
               a --tolerant PASS is NOT a driver-gate pass).

Oracle type lint (always on): every oracle query is DESCRIBEd and any
output column typed HUGEINT (or DECIMAL when the Spark side is not a
decimal) FAILS the query even if values match — DuckDB renders HUGEINT
differently from Spark's BIGINT in the driver's hasher, so uncast
integer sum()s are a latent hash-fail. Cast them in the oracle SQL
(CAST(sum(x) AS BIGINT)).

Usage: python3 tools/check.py [--tolerant] <sfDir> <outDir> [name ...]
"""
import sys, json, glob, os, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted(rows, key=key)

def cmp_val_tolerant(a, b):
    if a is None or b is None:
        return (a is None and b is None), 0.0
    if isinstance(a, float) or isinstance(b, float):
        try: fa, fb = float(a), float(b)
        except (TypeError, ValueError): return str(a) == str(b), 0.0
        if math.isnan(fa) and math.isnan(fb): return True, 0.0
        d = abs(fa - fb)
        tol = 1e-9 * max(1.0, abs(fa), abs(fb))
        return d <= tol, d
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        if len(a) != len(b): return False, 0.0
        ok, mx = True, 0.0
        for x, y in zip(a, b):
            o, d = cmp_val_tolerant(x, y); ok = ok and o; mx = max(mx, d)
        return ok, mx
    return str(a) == str(b), 0.0

def cmp_val_exact(a, b):
    """Driver-faithful compare: exact rendered equality, no tolerance.

    Both sides arrive as Python values (parquet via pyarrow, DuckDB via
    fetchall); bitwise-equal doubles repr identically, and any integer
    type-width divergence (HUGEINT vs BIGINT) shows up as a separate
    lint failure before this runs."""
    if a is None or b is None:
        return (a is None and b is None), 0.0
    if isinstance(a, float) and isinstance(b, float) \
            and math.isnan(a) and math.isnan(b):
        return True, 0.0
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        if len(a) != len(b): return False, 0.0
        for x, y in zip(a, b):
            ok, _ = cmp_val_exact(x, y)
            if not ok: return False, 0.0
        return True, 0.0
    return str(a) == str(b), 0.0

def lint_oracle_types(con, sql, spark_schema):
    """FAIL-worthy oracle output types: HUGEINT always (Spark has no
    128-bit int; the driver hash diverges), DECIMAL unless the Spark
    side of the same column is itself a decimal."""
    bad = []
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        return [f"describe-error: {e}"]
    spark_types = {f.name: str(f.type) for f in spark_schema} if spark_schema is not None else {}
    for row in desc:
        cname, ctype = row[0], str(row[1]).upper()
        if "HUGEINT" in ctype:
            bad.append(f"{cname}:{ctype}")
        elif ctype.startswith("DECIMAL"):
            if not spark_types.get(cname, "").startswith("decimal"):
                bad.append(f"{cname}:{ctype} (spark side {spark_types.get(cname,'?')})")
    return bad

def main():
    args = [a for a in sys.argv[1:]]
    tolerant = "--tolerant" in args
    if tolerant: args.remove("--tolerant")
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    cmp_val = cmp_val_tolerant if tolerant else cmp_val_exact
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_nooracle = 0
    for name in names:
        if only and name not in only: continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        st = pq.read_table(files[0])
        scols = sorted(st.column_names)
        srows = canon([tuple(r[c] for c in scols) for r in st.to_pylist()])
        if name not in oracle:
            print(f"----  {name}: no oracle (rows-only), {len(srows)} rows")
            n_nooracle += 1
            if len(srows) == 0: print(f"WARN {name}: zero rows")
            continue
        lint = lint_oracle_types(con, oracle[name], st.schema)
        if lint:
            print(f"FAIL {name}: oracle type lint: {', '.join(lint)} "
                  f"— cast to BIGINT/DOUBLE in the oracle SQL")
            n_fail += 1; continue
        try:
            res = con.execute(oracle[name])
            ocols_raw = [d[0] for d in res.description]
            orows_raw = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        ocols = sorted(ocols_raw)
        idx = [ocols_raw.index(c) for c in ocols]
        orows = canon([tuple(r[i] for i in idx) for r in orows_raw])
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); n_fail += 1; continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); n_fail += 1; continue
        bad, maxdev = None, 0.0
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            for c, (sv, ov) in zip(scols, zip(sr, orow)):
                ok, d = cmp_val(sv, ov)
                maxdev = max(maxdev, d)
                if not ok and bad is None:
                    bad = (i, c, sv, ov)
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            dev = f" maxfloatdev={maxdev:.2e}" if maxdev else ""
            print(f"PASS {name}: {len(srows)} rows{dev}")
            n_pass += 1
    mode = "tolerant (NOT the driver gate)" if tolerant else "exact (driver-faithful)"
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nooracle} rows-only [{mode}]")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
