#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 scripts/local_t2.py <verify_out_dir> <sf_dir> [query ...]

Reads each <name>/ parquet result produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables,
and compares: schema (column names sorted), row count, and values
(rows sorted, exact for non-floats, bit-exact for floats since the engine
uses decimal-exact aggregation).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

def load_result(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])

def normalize(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = []
    data = tbl.to_pydict()
    n = tbl.num_rows
    for i in range(n):
        rows.append(tuple(norm_val(data[c][i]) for c in cols))
    return cols, sorted(rows, key=repr)

def norm_val(v):
    # Type-strict, like the driver's hash compare: a DuckDB HUGEINT
    # surfacing as Decimal(42) must NOT equal Spark's int 42 — the old
    # float coercion green-lit exactly what the driver reds (r1 q34/q61/
    # q70). Each value carries a type tag; only same-type equal values pass.
    import datetime, decimal
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", v)
    if isinstance(v, list):
        return ("list", tuple(norm_val(x) for x in v))
    return (type(v).__name__, v)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        got = load_result(d)
        if got is None:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({got.num_rows} rows)"); n_skip += 1; continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, gr = normalize(got)
        ec, er = normalize(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}"); n_fail += 1; continue
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first: got={bad[0][0]} exp={bad[0][1]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skipped (rows-only)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
