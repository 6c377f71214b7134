#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
sfDir parquet tables, and compares: column names (sorted), row count,
and cell values with rows sorted by all columns. Prints PASS/FAIL per
query. Dev-only tool — the deliverable engine is the Scala code.
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "nan")
        return (1, repr(v))
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return (1, repr(float(v)) if False else str(v))
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        return (2, v.isoformat())
    if isinstance(v, (list, tuple)):
        return (3, tuple(norm(x) for x in v))
    if isinstance(v, bytes):
        return (4, v.hex())
    return (5, str(v))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out

def norm_type(t):
    """Collapse diffs the driver's hash does NOT care about, keeping the
    ones it does (HUGEINT vs BIGINT, DECIMAL vs DOUBLE, INT32 vs INT64)."""
    t = t.upper()
    if t == "TIMESTAMP WITH TIME ZONE":
        return "TIMESTAMP"
    return t

def type_map(con, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: norm_type(r[1]) for r in rows}

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark directory-layout table
            p = f"{p}/*.parquet"
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got_rows)} rows)"); continue
        try:
            exp = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1; continue
        # Driver's hash is output-type-sensitive (r5 DECIMAL, r6 HUGEINT):
        # assert the DuckDB-visible type of every oracle output column
        # matches the Spark parquet physical type.
        try:
            gt = type_map(con, f"SELECT * FROM read_parquet({files!r})")
            et = type_map(con, f"({oracle[name]})")
            tdiff = [(c, gt.get(c), et.get(c)) for c in gt
                     if gt.get(c) != et.get(c)]
            if tdiff:
                print(f"FAIL {name}: type mismatch (spark, oracle): {tdiff}")
                n_fail += 1; continue
        except Exception as e:
            print(f"FAIL {name}: describe error: {e}"); n_fail += 1; continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1; continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g != e:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
