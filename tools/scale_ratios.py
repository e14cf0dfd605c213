#!/usr/bin/env python3
"""Per-query scale ratios from a two-leg graft.Bench JSON line.

Usage: python3 tools/scale_ratios.py <bench.json> [K]

The bench's primary leg (`queries`) is the BIG point, the secondary
(`queries2`) the small one; prints per-query ratio big/small sorted
descending, with the nominal data factor K (default 10) for reference —
a ratio near K is linear scaling, well under K is floor-bound or
sub-linear (index probes), and far above K is the super-linear tail to
attribute or fix.
"""
import json
import sys


def main(path, k):
    rec = json.load(open(path))
    big, small = rec["queries"], rec.get("queries2", {})
    rows = []
    for name, tb in sorted(big.items()):
        ts = small.get(name)
        if ts is None or ts <= 0 or tb <= 0:
            rows.append((float("nan"), name, tb, ts))
        else:
            rows.append((tb / ts, name, tb, ts))
    rows.sort(reverse=True, key=lambda r: (r[0] == r[0], r[0]))
    print(f"{'ratio':>8}  {'big_s':>9}  {'small_s':>9}  (K={k})  query")
    for ratio, name, tb, ts in rows:
        print(f"{ratio:8.2f}  {tb:9.3f}  {ts if ts is not None else -1:9.3f}"
              f"          {name}")
    ok = [r[0] for r in rows if r[0] == r[0]]
    if ok:
        ok.sort()
        print(f"-- n={len(ok)} median={ok[len(ok)//2]:.2f} "
              f"sum_big={sum(r[2] for r in rows):.1f}s "
              f"sum_small={sum(r[3] or 0 for r in rows):.1f}s "
              f"overall={sum(r[2] for r in rows)/max(1e-9, sum(r[3] or 0 for r in rows)):.2f}x")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
