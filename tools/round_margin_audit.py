#!/usr/bin/env python3
"""Tie-margin audit for round() calls in the oracle SQL suite.

Why: `round(x, n)` on a DOUBLE is only engine-portable when x·10^n is far
from a .5 tie. Spark rounds the exact decimal expansion of the double
(BigDecimal HALF_UP); DuckDB rounds via fp multiply + nearbyint, whose exact
behavior has changed across DuckDB versions — on a near-tie the two can
differ by 1 ulp of the rounded digit (the q77/q86 incident class). Rounds of
DERIVED doubles were removed from the suite (raw IEEE values are
bit-identical when inputs are exact); the rounds that REMAIN are protection
against fp-association noise in ordered aggregates, and are safe only when
the true value sits on the n-dp grid (margin ≈ 0.5) or at least far from a
tie. This tool measures that margin for every surviving round.

Usage: python3 tools/round_margin_audit.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - locates the FINAL top-level SELECT's projection list (paren-matched);
  - for each `round(E, n) AS alias` there, rewrites the projection to emit
    the pre-round tie margin  abs((E)·10^n − floor((E)·10^n) − 0.5)
    (distance of E·10^n to the nearest .5 rounding boundary, in [0, 0.5]);
  - runs the rewritten query in DuckDB and reports the minimum margin.
ALERT when the margin is < 1e-6 (absolute, i.e. within 1e-6 of a tie at the
rounded digit — far below any value fp-association noise can produce, so a
sub-margin value means the round is NOT protecting, it is gambling).
Rounds in CTEs / WHERE clauses are semantic (they DEFINE values, e.g. exact
2-dp daily revenue, rather than format output) and are listed but not
audited. Exits 1 on any alert.
"""
import sys, json, os, re
import duckdb

ALERT = 1e-6


def depth0_spans(sql):
    """Yield (index, char) for chars at paren depth 0, skipping quoted strings."""
    depth = 0
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            yield i, c
        i += 1


def final_select_start(sql):
    """Index just after the last depth-0 SELECT keyword."""
    last = None
    text = sql.upper()
    for i, _ in depth0_spans(sql):
        if text[i:i + 6] == "SELECT" and (i == 0 or not text[i - 1].isalnum()):
            last = i
    return last


def find_rounds(sql, start=0):
    """Paren-matched `round(E, n)` occurrences at/after `start`.

    Returns list of (span_start, span_end, expr, n) for 2-arg rounds whose
    second arg is an integer literal."""
    out = []
    for m in re.finditer(r"\bround\s*\(", sql[start:], re.IGNORECASE):
        b = start + m.end()  # just past the opening paren
        depth = 1
        i = b
        top_comma = None
        while i < len(sql) and depth > 0:
            c = sql[i]
            if c == "'":
                i += 1
                while i < len(sql) and sql[i] != "'":
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_comma = i
            i += 1
        if depth != 0 or top_comma is None:
            continue
        expr = sql[b:top_comma].strip()
        narg = sql[top_comma + 1:i - 1].strip()
        if re.fullmatch(r"-?\d+", narg):
            out.append((start + m.start(), i, expr, int(narg)))
    return out


def margin_expr(expr, n):
    y = f"(({expr}) * 1e{n})"
    return f"abs({y} - floor({y}) - 0.5)"


def alias_of(sql, end):
    m = re.match(r"\s*(?:::\w+\s*)?AS\s+(\w+)", sql[end:], re.IGNORECASE)
    return m.group(1) if m else None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    ver = con.execute("SELECT version()").fetchone()[0]
    print(f"DuckDB version: {ver}")
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_audited = n_semantic = n_alerts = 0
    for name in sorted(oracle):
        sql = oracle[name]
        fsel = final_select_start(sql)
        all_rounds = find_rounds(sql)
        finals = [r for r in find_rounds(sql, fsel)] if fsel is not None else []
        # restrict finals to the projection list: before the final FROM
        fin_from = None
        up = sql.upper()
        for i, _ in depth0_spans(sql):
            if i > fsel and up[i:i + 4] == "FROM" and not up[i - 1].isalnum():
                fin_from = i
                break
        if fin_from is not None:
            finals = [r for r in finals if r[0] < fin_from]
        semantic = len(all_rounds) - len(finals)
        n_semantic += semantic
        if not finals:
            if semantic:
                print(f"{name}: {semantic} semantic round(s) (CTE/WHERE — "
                      f"define exact values, not audited)")
            continue
        # rewrite final-projection rounds to margin expressions, back to front
        probes = []
        rewritten = sql
        for k, (s, e, expr, n) in enumerate(reversed(finals)):
            al = alias_of(sql, e)
            col = f"__margin_{len(finals) - 1 - k}"
            if al is None:
                # no alias → replace the round and alias the margin ourselves
                rewritten = (rewritten[:s] + margin_expr(expr, n) + " AS "
                             + col + rewritten[e:])
            else:
                rewritten = (rewritten[:s] + margin_expr(expr, n)
                             + rewritten[e:])
                col = al
            probes.append((col, n, expr.replace("\n", " ")[:60]))
        probes.reverse()
        aggs = ", ".join(f"min({c}) AS {c}" for c, _, _ in probes)
        try:
            row = con.execute(
                f"SELECT {aggs} FROM ({rewritten}) __t").fetchone()
        except Exception as ex:
            print(f"{name}: AUDIT-ERROR {type(ex).__name__}: {ex}")
            n_alerts += 1
            continue
        for (col, n, expr), v in zip(probes, row):
            n_audited += 1
            if v is None:
                print(f"{name}.{col}: no rows / all NULL")
            elif v < ALERT:
                n_alerts += 1
                print(f"{name}.{col}: ALERT margin={v:.3e} < {ALERT} "
                      f"(round at {n} dp of `{expr}`)")
            else:
                print(f"{name}.{col}: ok margin={v:.3e} (round at {n} dp)")
    print(f"\n== {n_audited} final-projection rounds audited, "
          f"{n_semantic} semantic rounds skipped, {n_alerts} alerts ==")
    return 1 if n_alerts else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
