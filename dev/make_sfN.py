#!/usr/bin/env python3
"""Scale a driver testdata directory up by an integer factor for soak
runs (e.g. sf0.1 x10 -> "sf1"), preserving parquet physical types
(notably events.ts TIMESTAMP(NANOS), which a Spark rewrite under
nanosAsLong would flatten to plain INT64 and break the DuckDB oracle's
CAST(ts AS TIMESTAMP)).

Replication is FK-consistent:
  - dims (region/nation/customer/supplier/part) copy through unchanged;
  - orders + lineitem replicate with the SAME o_orderkey/l_orderkey
    offset per copy, so the order join and every dim FK stay valid;
  - events/documents/embeddings replicate with id offsets (timestamps
    and payloads unchanged - dedup/session/ANN queries see denser data,
    which is the point of the soak).

Usage: python3 dev/make_sfN.py SRC_DIR DST_DIR FACTOR
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def replicate(src, dst, factor, shift_cols):
    t = pq.read_table(src)
    if not shift_cols:
        pq.write_table(t, dst)
        return t.num_rows
    offs = {c: pc.max(t[c]).as_py() + 1 for c in shift_cols}
    copies = []
    for i in range(factor):
        c = t
        for col, off in offs.items():
            if i:
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c[col], i * off)
                c = c.set_column(idx, c.schema.field(idx), shifted)
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, dst)
    return out.num_rows


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    plan = {
        'region': [], 'nation': [], 'customer': [], 'supplier': [],
        'part': [],
        'orders': ['o_orderkey'],
        'lineitem': ['l_orderkey'],
        'events': ['event_id'],
        'documents': ['doc_id'],
        'embeddings': ['vec_id'],
    }
    for table, cols in plan.items():
        n = replicate(f'{src}/{table}.parquet', f'{dst}/{table}.parquet',
                      factor, cols)
        print(f'{table}: {n} rows')


if __name__ == '__main__':
    main()
