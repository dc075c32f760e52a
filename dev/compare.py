#!/usr/bin/env python3
"""Dev-only oracle comparison: mimics the driver's DuckDB check.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir>

For each query output parquet under <verifyOutDir>/<name>/, runs the
matching SQL from oracle_sql.json in DuckDB (with views for each testdata
table), and compares row count, column names/types, and cell values
(column-name-sorted, exact for non-floats, tiny epsilon reported for
floats so we can see how close doubles are).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: cols {gc} != {wc}"); n_fail += 1; continue
        got, want = got[gc], want[wc]
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1; continue
        gt = [str(t) for t in got.dtypes]; wt = [str(t) for t in want.dtypes]
        def eq(x, y):
            if isinstance(x, (list, tuple)) or "ndarray" in type(x).__name__:
                xs, ys = list(x), list(y)
                return len(xs) == len(ys) and all(eq(a, b) for a, b in zip(xs, ys))
            try:
                if x == y: return True
            except Exception:
                pass
            return str(x) == str(y)
        mismatch = []
        for c in gc:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if not eq(x, y):
                    mismatch.append((c, i, x, y))
                    if len(mismatch) > 3: break
            if len(mismatch) > 3: break
        if mismatch:
            print(f"FAIL {name}: value mismatches {mismatch[:4]}")
            n_fail += 1
        else:
            note = "" if gt == wt else f"  [dtype note: {list(zip(gc,gt,wt))}]"
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
