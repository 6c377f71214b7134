#!/usr/bin/env python3
"""Pandas-faithful replica of the driver's t2 hash gate.

The driver (per the x5_features_stub traceback in CORRECTNESS_r01.json)
loads the Spark parquet and the DuckDB oracle result into pandas,
sorts columns by name, sorts rows by all columns, and hash-compares
values. This tool reproduces that path and reports dtype-level and
value-level diffs per query, so hash mismatches can be diagnosed
exactly instead of guessed at.

Usage: python3 tools/pdcheck.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, os, math
import duckdb, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon_frame(df):
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
        return df, None
    except Exception as e:
        return df, f"sort_values error: {e}"

def cell(v):
    # value-level canonical form; keep type class visible
    import decimal, datetime
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    return f"s:{v}"

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        if only and name not in only: continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.read_parquet(files[0]) if len(files)==1 else pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            # still exercise the sort path the driver runs
            _, err = canon_frame(got)
            tag = f"sort-crash: {err}" if err else "ok"
            print(f"SKIP {name}: no oracle ({len(got)} rows, sortable={tag})")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} != {sorted(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        g, ge = canon_frame(got); e, ee = canon_frame(exp)
        if ge or ee:
            print(f"FAIL {name}: {ge or ee}"); n_fail += 1; continue
        dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        gv = [tuple(cell(v) for v in row) for row in g.itertuples(index=False, name=None)]
        ev = [tuple(cell(v) for v in row) for row in e.itertuples(index=False, name=None)]
        gv.sort(); ev.sort()
        if gv != ev:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b][:3]
            print(f"FAIL {name}: dtypes diff={dt}; first value diffs: {diffs}")
            n_fail += 1; continue
        if dt:
            print(f"WARN {name}: values match but dtypes differ: {dt}"); n_pass += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main()
