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

# ---------------------------------------------------------------------------
# Raw-double output audit (round-6 extension).
#
# Every DOUBLE column a query emits unrounded must fall into a class that is
# engine-portable BY CONSTRUCTION; anything unclassified (or classified as a
# contractible chain) is flagged. Classes:
#
#   stored   passthrough of a parquet double (min/max/first of it included):
#            bit-exact by definition.
#   round    round()-protected — the tie-margin pass above audits these.
#   div1     ONE fp op (usually a division, sometimes just an int/decimal →
#            double conversion) applied to EXACT integer/decimal inputs: a
#            single correctly-rounded IEEE op is bit-identical everywhere.
#   chain    >1 fp ops but in shapes with NO multiply feeding an add/sub in
#            double (div-by-product-of-sqrts, square-over-product, adds of
#            division results, subtract-then-divide, sequential recursive
#            per-op folds): nothing a compiler may legally contract into an
#            FMA, every op individually correctly rounded.
#   pow2     affine combinations whose multiplies are by powers of two
#            (0.5·x is EXACT, so even a contracted fma(0.5, x, c) is
#            bit-identical to the uncontracted form).
#   qcont    the percentile-interpolation formula bit-verified against
#            DuckDB's quantile_cont (cross-engine-identical on doubles,
#            driver-green since round 2 — internal to DuckDB's C++, not
#            rewritable from SQL).
#   osum     ordered-frame sums/averages of stored doubles (deterministic
#            frame order on both engines; driver-green since round 3).
#   grid     fixed-grid bucket-bound arithmetic lo + b·(hi−lo)/nb: DOES
#            contain a multiply-into-add, but both engines evaluate the
#            IDENTICAL expression over identical inputs with per-operator
#            vectorized kernels (no cross-kernel contraction is possible in
#            either interpreter/JVM), and the class is driver-green since
#            q54 landed in round 3. Kept distinct from `chain` so the
#            stricter no-mul-into-add guarantee stays meaningful.
#
# The q77 class — a multiply-subtract/add OVER DOUBLES (n·sxy − sx·sy,
# vp + (vn−vp)·t …) — is NOT allowed: those were rewritten to exact integer/
# decimal numerators in round 6 (q74, q112, q77 itself).
DOUBLE_CLASSES = {
    "q01_pricing_rollup": dict.fromkeys(
        ["sum_qty", "sum_base", "sum_disc_price", "sum_charge"], "round"),
    "q02_cust_orders": {"total_spent": "round"},
    "q03_region_rollup": {"sum_acctbal": "round"},
    "q04_filter_project": {"l_quantity": "stored", "charge": "chain"},
    "q05_top_orders": {"o_totalprice": "stored"},
    "q09_nation_revenue": {"revenue": "round"},
    "q100_skyline": {"price": "stored"},
    "q103_merge_upsert": {"c_acctbal": "div1"},
    "q104_retrieval": {"score": "div1"},
    "q105_embedding_standardize": {"z": "chain"},
    "q106_winsorized_mean": {"lo": "qcont", "hi": "qcont",
                             "winsorized_mean": "round"},
    "q108_kmeans_step": {"new_c": "div1"},
    "q109_equidepth": {"min_v": "stored", "max_v": "stored"},
    "q111_power_iteration": {"v2": "div1", "v2_scaled": "div1"},
    "q112_interpolate": {"revenue": "stored", "interp": "div1"},
    "q113_chi_square": {"expected": "div1", "chi2_cell": "div1"},
    "q115_markov": {"p": "div1"},
    "q116_class_scatter": {"mean": "div1", "var_pop": "div1"},
    "q117_hybrid_rrf": {"rrf": "chain"},
    "q119_capped_balance": {"net": "div1", "bal": "div1"},
    "q120_ab_test": dict.fromkeys(["mean0", "mean1", "var0", "var1"], "div1")
                    | {"t_welch": "chain"},
    "q121_waterfill": {"allocated": "div1"},
    "q122_distribution_drift": {"tvd": "div1"},
    "q125_gini": {"gini": "div1"},
    "q126_weighted_median": {"p": "stored", "value": "qcont"},
    "q127_kaplan_meier": {"survival": "chain"},
    "q128_event_diversity": {"gini_impurity": "div1"},
    "q12_tumbling_window": {"sum_value": "round"},
    "q13_quality_features": dict.fromkeys(
        ["avg_token_len", "type_token_ratio", "stopword_ratio"], "div1"),
    "q131_ltv_triangle": {"ltv_per_user": "div1"},
    "q132_rfm": {"avg_cents": "div1"},
    "q133_assoc_rules": {"conf_ab": "div1", "conf_ba": "div1",
                         "lift": "div1"},
    "q134_link_predict": {"jaccard": "div1"},
    "q135_revenue_deciles": {"cum_share": "div1"},
    "q136_hll_distinct": {"hll_est": "chain", "rel_err": "chain"},
    "q137_cross_sell": {"conf": "div1"},
    "q138_higher_moments": {"mean": "div1", "variance": "div1",
                            "skewness": "chain", "kurtosis_excess": "chain"},
    "q139_conversion_latency": {"p": "stored", "value": "qcont"},
    # mmr_score became exact DECIMAL(13,7) in round 6 (λ·rel − (1−λ)·sim
    # was the one genuine multiply-into-subtract left on doubles)
    "q142_mmr_rerank": {"rel": "chain"},
    "q152_ndcg": {"ndcg": "div1"},  # dcg/idcg are exact decimals
    "q154_kmv_set_algebra": {"union_est": "div1", "inter_est": "div1"},
    "q155_split_leakage": {"containment": "div1"},
    # every CUPED readout is one division of exact HUGEINT/DECIMAL(38,0)
    # terms (the closed-form mean_adj numerator, the q74 discipline)
    "q156_cuped": dict.fromkeys(["mean_post", "theta", "mean_adj"], "div1"),
    "q157_mrr": {"rr": "div1"},
    "q158_lsh_quality": {"recall": "div1", "precision": "div1"},
    "q159_snapshot_diff": {"churn": "div1"},
    "q160_calibration": {"mean_conf": "div1", "accuracy": "div1"},
    "q161_vocab_coverage": {"coverage": "div1"},
    "q162_hist_quantile": {"p": "stored", "bucket_lo": "grid",
                           "bucket_hi": "grid", "exact": "qcont"},
    "q143_dow_baseline": {"ratio_to_dow_mean": "div1"},
    "q144_ship_latency": {"p": "stored", "value": "qcont"},
    "q145_rolling_corr": {"rolling_corr": "chain"},
    "q146_ks_test": {"ks": "div1"},
    "q147_langid_kappa": {"kappa": "div1"},
    "q148_hhi": {"hhi": "round", "effective_suppliers": "div1"},
    "q149_dispersion": {"dispersion": "div1"},
    "q150_source_scorecard": {"mean_chars": "div1", "lang_impurity": "div1"},
    "q169_incremental_dedup": {"jaccard": "div1"},
    # q263 replays the q169 gate (same inter/(sza+szb-inter) on exact ints)
    "q263_stream_dedup_gate": {"jaccard": "div1"},
    "q172_source_overlap": {"containment": "div1"},
    "q176_label_fusion": {"kappa": "div1"},
    "q186_bpe_fertility": {"fertility": "div1"},
    "q188_source_drift": {"tvd": "div1"},
    "q189_ivf_quality": {"recall": "div1", "precision": "div1"},
    "q191_cluster_purity": {"impurity": "div1"},
    "q192_oov_rate": {"oov_rate": "div1"},
    "q193_srm_check": {"chi2": "div1"},
    "q194_quality_gate": {"mean_logit_micro": "div1"},
    "q231_bradley_terry": {"strength": "round"},
    "q234_group_auc": {"auc": "div1"},
    "q235_avg_precision": {"ap": "div1"},
    "q236_join_fanout": {"avg_fanout": "div1"},
    "q240_watermark_detect": {"z": "chain"},
    "q242_krippendorff": {"alpha": "div1"},
    "q243_reward_length_bias": {"corr": "chain",
                                "slope_micro_per_tok": "div1",
                                "intercept": "div1", "r2": "chain"},
    "q244_group_advantage": {"max_adv": "chain", "min_adv": "chain"},
    "q16_ngram_jaccard": {"jaccard": "div1"},
    "q17_minhash_neardup": {"jaccard": "div1"},
    "q19_cosine_topk": {"cos": "chain"},
    "q20_cosine_neardup": {"cos": "chain"},
    "q21_yolo_norm": dict.fromkeys(
        ["x_center", "y_center", "w_norm", "h_norm"], "pow2"),
    "q22_best_match": {"iou": "chain"},
    "q23_greedy_eval": {"precision": "div1", "recall": "div1", "f1": "chain"},
    "q24_lsh_cosine": {"cos": "chain"},
    "q28_argmax": {"c_acctbal": "stored"},
    "q30_curation_pipeline": {"stopword_ratio": "div1"},
    "q31_ivf_topk": {"cos": "chain"},
    "q33_cube": {"sum_qty": "round"},
    "q37_percentiles": dict.fromkeys(["p50", "p90", "qty_p25"], "qcont"),
    "q38_window_frames": {"o_totalprice": "stored", "prev_price": "stored",
                          "delta": "chain", "ma3": "osum"},
    "q39_band_join": {"lo": "stored", "hi": "stored", "sum_price": "round"},
    "q40_tfidf_topk": {"score": "chain"},
    "q41_heavy_hitters": {"share": "div1"},
    "q42_zscore": {"c_acctbal": "stored", "seg_mean": "round",
                   "seg_std": "round", "zscore": "chain"},
    "q43_stratified_sample": {"c_acctbal": "stored"},
    "q44_kmv_distinct": {"kmv_estimate": "div1"},
    "q47_time_rollup": {"revenue": "round"},
    "q49_ranking": {"c_acctbal": "stored", "prk": "div1"},
    "q50_contamination": {"contamination": "div1"},
    "q51_repetition": dict.fromkeys(
        ["dup_2gram_frac", "dup_3gram_frac", "top_2gram_share"], "div1"),
    "q52_chunk_dedup": {"keep_frac": "div1"},
    "q53_gapfill": {"revenue": "round", "revenue_locf": "round"},
    "q54_histogram": {"bucket_lo": "grid", "bucket_hi": "grid"},
    "q55_profile": {"min_num": "stored", "max_num": "stored"},
    "q56_weighted_sample": {"o_totalprice": "stored",
                            "priority_key": "div1"},
    "q57_vec_quantize": {"scale": "stored"},
    "q58_json_rollup": {"avg_k": "div1"},
    "q61_iqr_outliers": {"high_fence": "pow2"},
    "q62_rolling_range": {"sum_24h": "round"},
    "q64_pagerank": {"rank": "round"},
    "q65_full_outer": {"cust_bal": "stored"},
    "q66_percentiles_distributed": {"p": "stored", "value": "qcont"},
    "q68_incremental_agg": {"sum_value": "round"},
    "q69_share_of_total": {"c_acctbal": "stored", "share": "div1",
                           "cum_share": "div1"},
    "q70_hopping_window": {"sum_value": "round"},
    "q74_corr_regression": {"corr": "chain", "slope_cents_per_unit": "div1",
                            "intercept": "div1", "r2": "chain"},
    "q75_grouping_sets": {"sum_qty": "round"},
    "q80_collocations": {"lift": "div1"},
    "q82_delta_join": {"revenue": "round"},
    "q84_containment": {"containment": "div1"},
    "q85_mad_outliers": {"med": "qcont", "mad": "qcont"},
    "q86_ema": {"rev": "round", "ema": "round"},
    "q88_sql_scalar_subquery": {"sum_qty": "round"},
    "q90_stratified_split": {"frac_of_lang": "div1", "class_weight": "div1"},
    "q96_period_over_period": {"rev": "round", "prev_rev": "round",
                               "mom_growth": "div1"},
    "q97_cohort_retention": {"retention": "div1"},
    "q99_bigram_lm": {"p": "div1"},
}
OK_CLASSES = {"stored", "round", "div1", "chain", "pow2", "qcont", "osum", "grid"}


def audit_raw_doubles(out_dir):
    """Flag any emitted double/float column without a portability class."""
    import glob
    try:
        import pyarrow.parquet as pq
    except ImportError:
        print("raw-double audit skipped: pyarrow unavailable")
        return 0
    n_cols = n_flag = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(d)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            continue
        sch = pq.read_schema(files[0])
        for f in sch:
            if str(f.type) not in ("double", "float"):
                continue
            n_cols += 1
            cls = DOUBLE_CLASSES.get(name, {}).get(f.name)
            if cls not in OK_CLASSES:
                n_flag += 1
                print(f"{name}.{f.name}: UNCLASSIFIED raw double — classify "
                      f"or route through DECIMAL/round")
    print(f"== raw-double audit: {n_cols} double columns, "
          f"{n_flag} unclassified ==")
    return n_flag


def depth0_spans(sql):
    """Yield (index, char) for chars at paren depth 0, skipping quoted
    strings and `--` line comments (an apostrophe inside a comment must
    not open a string — q174's scaladoc-style SQL comment does exactly
    that)."""
    depth = 0
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "-" and i + 1 < len(sql) and sql[i + 1] == "-":
            while i < len(sql) and sql[i] != "\n":
                i += 1
            continue
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
        if fsel is None:
            print(f"{name}: WARNING — no depth-0 final SELECT found; "
                  f"rounds (if any) not audited")
            continue
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
    n_alerts += audit_raw_doubles(out_dir)
    return 1 if n_alerts else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
