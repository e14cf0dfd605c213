#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the matching oracle SQL in DuckDB
over the same parquet tables and compares: row count, column names/types, and
an order-insensitive hash of all values (columns sorted by name).
"""
import sys, json, glob, os, time
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def table_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    timings = {}  # per-query oracle SQL wall seconds (the driver-wall budget)
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"{name}: NO OUTPUT"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        s_cols = list(spark_tbl.schema.names)
        s_rows = [tuple(r[c] for c in s_cols) for r in spark_tbl.to_pylist()]
        if name not in oracle:
            print(f"{name}: rows-only ({len(s_rows)} rows) "
                  f"{'OK' if len(s_rows) > 0 else 'EMPTY!'}")
            n_rowsonly += 1
            continue
        try:
            t0 = time.monotonic()
            res = con.execute(oracle[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
            timings[name] = time.monotonic() - t0
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"{name}: COLUMN MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        if len(s_rows) != len(d_rows):
            print(f"{name}: ROWCOUNT spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        if ok:
            h1 = table_fingerprint(s_cols, s_rows)
            d_named = [tuple(r[d_cols.index(c)] for c in d_cols) for r in d_rows]
            h2 = table_fingerprint(d_cols, d_named)
            if h1 != h2:
                print(f"{name}: HASH MISMATCH ({len(s_rows)} rows)")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("|".join(norm_cell(r[i]) for i in order_d) for r in d_named)
                diffs = [(a, b) for a, b in zip(ls, ld) if a != b]
                for a, b in diffs[:3]:
                    print(f"   spark: {a[:200]}")
                    print(f"   duck : {b[:200]}")
                ok = False
        if ok:
            print(f"{name}: PASS ({len(s_rows)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    top = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    total = sum(timings.values())
    print(f"oracle SQL wall: {total:.1f}s total; top 10:")
    for name, t in top:
        print(f"  {t:7.2f}s  {name}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
