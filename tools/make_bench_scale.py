#!/usr/bin/env python3
"""Build a K-times replica of an sf dir for the extra Bench scale point.

Usage: python3 tools/make_bench_scale.py <srcSfDir> <outDir> [K=10]

Each fact table is unioned K times with entity keys offset by a
power-of-ten stride (so replica keys never collide and referential
integrity is preserved: orders.o_custkey moves with customer.c_custkey,
lineitem's three foreign keys move with their dimensions, events.user_id
moves with its replica, and so on). Dims `region`/`nation` are copied
as-is — they are fixed 5/25-row tables the engine broadcasts.

This is BENCH-ONLY derived data for timing the per-query scaling curve
(separating the JVM floor from data-volume cost); correctness runs stay
on the driver-generated testdata and its DuckDB oracle.

Timestamps are left untouched: K replicas land in the same time window,
which scales per-day/per-window row counts the way a K×-busier lake
would, without stretching the calendar the window queries bucket by.
"""
import sys
import duckdb

STRIDE = 10_000_000  # far above any sf0.1 key (max o_orderkey ~1.5e6)

TABLES = {
    "region": None,   # copy as-is
    "nation": None,
    "customer": "SELECT c_custkey + {o} AS c_custkey, c_name, c_nationkey, "
                "c_acctbal, c_mktsegment FROM t",
    "supplier": "SELECT s_suppkey + {o} AS s_suppkey, s_name, s_nationkey, "
                "s_acctbal FROM t",
    "part": "SELECT p_partkey + {o} AS p_partkey, p_name, p_brand, p_type, "
            "p_size, p_retailprice FROM t",
    "orders": "SELECT o_orderkey + {o} AS o_orderkey, o_custkey + {o} AS "
              "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
              "o_orderpriority FROM t",
    "lineitem": "SELECT l_orderkey + {o} AS l_orderkey, l_partkey + {o} AS "
                "l_partkey, l_suppkey + {o} AS l_suppkey, l_linenumber, "
                "l_quantity, l_extendedprice, l_discount, l_tax, "
                "l_returnflag, l_linestatus, l_shipdate FROM t",
    "events": "SELECT event_id + {o} AS event_id, ts, user_id + {o} AS "
              "user_id, event_type, value, props FROM t",
    "documents": "SELECT doc_id + {o} AS doc_id, text, lang, source, "
                 "n_chars FROM t",
    "embeddings": "SELECT vec_id + {o} AS vec_id, embedding, label FROM t",
}


def main(src, out, k):
    import os
    import shutil
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for name, tmpl in TABLES.items():
        path = f"{src}/{name}.parquet"
        # Clean the target first: regenerating with a smaller K must not
        # leave stale part files silently inflating the table, and a FILE
        # left by the old single-file layout must not break os.makedirs.
        tgt = f"{out}/{name}.parquet"
        if os.path.isdir(tgt):
            shutil.rmtree(tgt)
        elif os.path.exists(tgt):
            os.remove(tgt)
        con.execute(f"CREATE OR REPLACE VIEW t AS "
                    f"SELECT * FROM read_parquet('{path}')")
        if tmpl is None:
            con.execute(f"COPY (SELECT * FROM t) TO "
                        f"'{out}/{name}.parquet' (FORMAT PARQUET)")
        else:
            # ONE FILE PER REPLICA (round 17): a K×-bigger lake arrives as
            # K× more files, so the scan's split count scales with the
            # data. The previous single-file layout capped small tables at
            # ONE input split (DuckDB's 122880-row row groups are the only
            # split points), which serialized every zero-exchange per-row
            # operator on one core at the 10× point — StageAudit measured
            # q51 as 1 task / 9.2 s CPU on a 32-core machine. That is a
            # fixture-layout artifact, not engine cost; this layout makes
            # the sweep measure the operators.
            d = f"{out}/{name}.parquet"
            os.makedirs(d, exist_ok=True)
            for i in range(k):
                con.execute(
                    f"COPY ({tmpl.format(o=i * STRIDE)}) TO "
                    f"'{d}/part-{i:03d}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet"
            f"{'' if tmpl is None else '/*.parquet'}')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    src, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, out, k)
