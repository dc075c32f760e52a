#!/usr/bin/env python3
"""Driver-STYLE oracle comparison (stricter than dev/compare.py).

Usage: python3 dev/compare_driver.py <sfDir> <verifyOutDir>

Emulates how the round driver checks correctness, which dev/compare.py
does NOT: the Spark result is read with pandas/pyarrow directly (exact
Decimal objects, numpy arrays, ns timestamps survive), while the oracle
runs through DuckDB's fetchdf (every DECIMAL becomes float64). Rows are
sorted with DataFrame.sort_values over all columns (crashes on
array-typed columns, like the driver did on round-1 q15), and cell
values are compared via their str() forms — so a Decimal('123.4500')
vs float64 123.45 mismatch that dev/compare.py hides FAILS here, as it
does in the driver's CORRECTNESS json.
"""
import sys, json, glob, os, hashlib
import pandas as pd
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    # Date normalization: pandas reads Spark DATE parquet as datetime.date
    # objects while DuckDB fetchdf yields midnight Timestamps; round-1
    # driver results (q07/q13 hash_match=true with DATE outputs) prove the
    # driver treats these as equal, so render both as Timestamps here.
    import datetime
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return str(pd.Timestamp(v))
    return str(v)


def frame_hash(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional third arg: comma-separated query subset (dev/soak loops run
    # one query per subprocess under `timeout` — some DuckDB oracles, e.g.
    # the shingle/minhash family at sf1, are orders slower than the Spark
    # side and need a bounded per-query budget)
    if only is not None:
        unknown = sorted(set(only) - set(oracle))
        if unknown:
            sys.exit(f"no such oracle: {', '.join(unknown)}")
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: read error {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: cols {gc} != {wc}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1; continue
        try:
            gh, wh = frame_hash(got), frame_hash(want)
        except Exception as e:
            print(f"FAIL {name}: hash err {type(e).__name__}: {e}")
            n_fail += 1; continue
        if gh != wh:
            # find first differing cell for the report
            g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
            w = want[wc].sort_values(by=wc, kind="mergesort").reset_index(drop=True)
            detail = ""
            for c in gc:
                for i, (x, y) in enumerate(zip(g[c], w[c])):
                    if cell(x) != cell(y):
                        detail = f" first diff col={c} row={i}: {x!r} != {y!r}"
                        break
                if detail:
                    break
            print(f"FAIL {name}: hash mismatch{detail}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries with no oracle entry -> rows-only note
    spark_only = sorted(set(os.path.basename(d) for d in glob.glob(f"{out_dir}/q*"))
                        - set(oracle))
    for name in spark_only:
        print(f"NOTE {name}: no oracle (rows-only check in driver)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], subset))
