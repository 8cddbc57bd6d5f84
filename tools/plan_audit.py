"""Physical-plan audit: captures `.explain("formatted")` for the headline
queries and checks the plan properties the 100 TB posture depends on —
filters pushed to the parquet scan, pruned read schemas, broadcast joins on
dimension tables, whole-stage codegen coverage, no cartesian products.

    python tools/plan_audit.py [--out PLANS.md] [names...]

Writes a markdown artifact with a per-query property table and the full
formatted plans, so plan regressions are visible in review diffs.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_dba_spark import registry  # noqa: E402
from spark_dba_spark.session import get_spark  # noqa: E402

# Queries where a pushed filter / pruned schema is structurally expected.
EXPECT_PUSHED = {
    "q01_pricing_summary", "q02_scan_filter_project", "q03_shipping_priority",
    "q05_local_supplier_volume", "q10_returned_item", "q06_forecast_revenue",
    "q14_promo_revenue",
}
EXPECT_BROADCAST = {
    "q03_shipping_priority", "q05_local_supplier_volume", "q10_returned_item",
    "join_broadcast_dim", "q07_volume_shipping", "q14_promo_revenue",
}

# Queries where a GLOBAL window (no partition spec — all rows to one task)
# is allowed because its input is provably dimension-/K-bounded, with the
# justification recorded here so the artifact carries the proof burden.
# Every other query with a global window is a FINDING: at 100 TB an
# unbounded global window is a single-task sort of the corpus.
# (VERDICT r5 "Next round" #6.)
# Per-query reader notes emitted verbatim into the artifact — for rows
# whose audited plan is not the production dataflow and would otherwise
# mislead (VERDICT r9 #6).
_CHECKPOINT_FRONTED = (
    "shows 0 parquet scans because the plan is fronted by an eager "
    "localCheckpoint of the BOUNDED upstream frame (the branched-lineage "
    "rule) — the real scan/shuffle pipeline executed when the checkpoint "
    "materialized; the audited plan covers the multi-round logic above it"
)

PLAN_NOTES: dict[str, str] = {
    "emb_km_diag_centroids": (
        "shows 0 scans because the RESULT is a driver-built "
        "createDataFrame of the K×D centroid integers — the audited plan "
        "is the trivial local relation; the production update path (scan "
        "+ assignment + bounded K×D exchange) executes inside _km_loop "
        "before the collect and is audited via emb_kmeans_lloyd's row"
    ),
    "graph_kcore_peel": _CHECKPOINT_FRONTED,
    "graph_label_propagation": _CHECKPOINT_FRONTED,
    "graph_global_transitivity": _CHECKPOINT_FRONTED,
    "graph_degree_histogram": _CHECKPOINT_FRONTED,
    "text_bpe_merge_sequence": _CHECKPOINT_FRONTED,
    "stats_kruskal_wallis_daily": _CHECKPOINT_FRONTED,
    # r11 checkpoint-fronted rows (each checkpoints a BOUNDED reduced
    # frame that feeds >=2 branches — marginals+cells, pools+merge,
    # counters+probe, totals+rank — per the branched-lineage rule)
    "sketch_hll_reaggregate": _CHECKPOINT_FRONTED,
    "stats_chi_square_source_length": _CHECKPOINT_FRONTED,
    "dedup_cross_source_matrix": _CHECKPOINT_FRONTED,
    "graph_component_density": _CHECKPOINT_FRONTED,
    "emb_binary_hamming_topk": _CHECKPOINT_FRONTED,
    "customer_value_deciles": _CHECKPOINT_FRONTED,
    "sketch_kmv_distinct": _CHECKPOINT_FRONTED,
    "orders_yoy_growth": _CHECKPOINT_FRONTED,
    "sketch_cms_heavy_change": _CHECKPOINT_FRONTED,
    "mm_payload_magic_profile": _CHECKPOINT_FRONTED,
    "mm_byte_bigram_topk": _CHECKPOINT_FRONTED,
    "ev_haar_energy_hourly": _CHECKPOINT_FRONTED,
    "dedup_paragraph_minhash": _CHECKPOINT_FRONTED,
    # r11 continuation batch (bounded reduced frames feeding >=2 branches)
    "text_vocab_rank_drift": _CHECKPOINT_FRONTED,
    "sketch_bloom_capacity_sweep": _CHECKPOINT_FRONTED,
    "orders_weekday_index": _CHECKPOINT_FRONTED,
    "mm_byte_delta_profile": _CHECKPOINT_FRONTED,
    "stats_permutation_diff": _CHECKPOINT_FRONTED,
    # r12 batch (each checkpoints a BOUNDED reduced frame feeding >=2
    # branches — the standing branched-lineage rule)
    "sketch_top_k_heavy_hitters": _CHECKPOINT_FRONTED,
    "dedup_semantic_kmeans": _CHECKPOINT_FRONTED,
    "text_bigram_lm_surprisal": _CHECKPOINT_FRONTED,
    "dedup_paragraph_cleaned_corpus": _CHECKPOINT_FRONTED,
    "text_eval_split_leakage": _CHECKPOINT_FRONTED,
    "text_cooccur_lift_topk": _CHECKPOINT_FRONTED,
    "text_positional_drift": _CHECKPOINT_FRONTED,
    "text_char_bigram_topk": _CHECKPOINT_FRONTED,
    "ev_dow_hour_heatmap": _CHECKPOINT_FRONTED,
    "ev_type_affinity_skew": _CHECKPOINT_FRONTED,
    "orders_price_band_month_mix": _CHECKPOINT_FRONTED,
    "lineitem_unit_price_outliers": _CHECKPOINT_FRONTED,
    "emb_quantile_clip_bounds": _CHECKPOINT_FRONTED,
    "emb_grid_cell_density": _CHECKPOINT_FRONTED,
    "sketch_kmv_setops": _CHECKPOINT_FRONTED,
    # r12 continuation batch (bounded reduced frames feeding >=2 branches)
    "dedup_component_cohesion": _CHECKPOINT_FRONTED,
    "graph_local_bridges": _CHECKPOINT_FRONTED,
    "emb_bucket_pair_cos_histogram": _CHECKPOINT_FRONTED,
    "text_source_bigram_uniqueness": _CHECKPOINT_FRONTED,
    "ev_hourly_mad_anomalies": _CHECKPOINT_FRONTED,
    "text_dedup_inflation_by_source": _CHECKPOINT_FRONTED,
    "sim_ivf_routing_balance": _CHECKPOINT_FRONTED,
    "stats_blomqvist_beta_brand": _CHECKPOINT_FRONTED,
    "stats_cramers_v_assoc": _CHECKPOINT_FRONTED,
    "dedup_cluster_pareto": _CHECKPOINT_FRONTED,
    "lineitem_promo_did": _CHECKPOINT_FRONTED,
    "graph_neardup_modularity": _CHECKPOINT_FRONTED,
    "graph_neardup_conductance": _CHECKPOINT_FRONTED,
    "emb_pq_codebook_utilization": _CHECKPOINT_FRONTED,
    # r13 batch (bounded reduced frames feeding >=2 branches — the
    # standing branched-lineage rule: tf table feeds norms + pair join,
    # bigram occ feeds pair + prefix counts)
    "text_bigram_entropy_rate": _CHECKPOINT_FRONTED,
    "text_source_tf_cosine_matrix": _CHECKPOINT_FRONTED,
    # r14 batch N (bounded reduced frames feeding >=2 branches — the
    # standing branched-lineage rule: the local-top-k candidate frame
    # feeds the baseline + overlap branches; the signature/bucket/pair
    # frames feed totals + expansion + capture)
    "emb_prefix_dim_recall": _CHECKPOINT_FRONTED,
    "dedup_lsh_band_planner": _CHECKPOINT_FRONTED,
    "emb_probe_hubness": _CHECKPOINT_FRONTED,
    # r14 batch O: the quantized corpus checkpoint feeds all four
    # k-sweep assignment branches
    "emb_kmeans_elbow": _CHECKPOINT_FRONTED,
    # r14 batch P: the bounded (type, hour) frame / the doc scan
    # checkpoint feed both join sides / all three shingle sizes
    "ev_lead_lag_xcorr": _CHECKPOINT_FRONTED,
    "dedup_shingle_size_sweep": _CHECKPOINT_FRONTED,
    # r14 batch R (bounded reduced frames feeding >=2 branches)
    "mm_dedup_net_savings": _CHECKPOINT_FRONTED,
    "graph_adamic_adar": _CHECKPOINT_FRONTED,
    "ev_type_mix_drift_weekly": _CHECKPOINT_FRONTED,
}

GLOBAL_WINDOW_BOUNDED: dict[str, str] = {
    # --- r14 third-window batches V-AC ---
    "stats_ljung_box_daily": (
        "lag-grid cumulative Q window (<= 7 rows) plus the zero-fill "
        "day-spine assembly — both calendar/constant bounded; the "
        "event stream reduces at day grain first"
    ),
    "stats_dickey_fuller_daily": (
        "LAG over the zero-filled day spine — calendar-bounded "
        "(<= feed-span days); events pre-reduced to daily counts"
    ),
    "emb_coverage_radius_net": (
        "rank windows over the 512-row hash-top-k net pool and the "
        "256-row probe min-distance table — both constant-bounded; "
        "the corpus is touched only by map-side partial top-k"
    ),
    "stats_cramer_von_mises_weekend": (
        "cumulative ECDF window at VALUE grain — bounded by the "
        "quantized micro-unit value domain, never the event stream"
    ),
    "stats_mood_median_weekend": (
        "value-grain cumulative for the grand-median selection — "
        "bounded by the distinct quantized values"
    ),
    "orders_abc_xyz_matrix": (
        "revenue cumshare rank over the PART dimension — the "
        "orders_abc_migration posture (parts, not lineitems)"
    ),
    "text_collocation_pmi": (
        "rank window over the >= count-floor bigram survivors — the "
        "floor prune caps the ranked frame far below the token stream"
    ),
    "stats_page_trend_test": (
        "global-order index over the TYPE alphabet (k rows) and the "
        "day x type dense grid windows — calendar x alphabet bounded"
    ),
    "ev_session_peak_concurrency": (
        "sweep-line cumulative over the MINUTE spine (1440 x days, "
        "calendar-bounded) — sessionization windows are user-"
        "partitioned; the event stream never enters a global window"
    ),
    "ev_capacity_shed_whatif": (
        "p90 rank over HOURLY loads — calendar-bounded (<= feed "
        "hours); allocation joins run at (hour x type) grain"
    ),
    "emb_ingestion_drift_halves": (
        "bucketed median selection: the global cumulative runs over "
        "the 65536-id BUCKET histogram (tiny), the rank window is "
        "bucket-partitioned (<= 65536 rows) — the "
        "agg_exact_global_median posture"
    ),
    "dedup_lsh_bucket_skew": (
        "p99 selection at bucket-SIZE grain — the (size -> count) "
        "table is tiny however many buckets exist"
    ),
    "stats_median_test_nations": (
        "grand-median selection at cents-VALUE grain — bounded by "
        "the price domain, never the order stream"
    ),
    "stats_nelson_aalen_interarrival": (
        "ascending/descending cumsums over the GAP-HOUR table — "
        "calendar-bounded (rows <= feed-span hours, ~720 at the "
        "fixtures); the fact stream is pre-reduced by the per-user "
        "LEAD pass and the dur_h groupBy"
    ),
    "emb_triplet_margin_rate": (
        "label-directory rank window (orderBy label) over the LABEL "
        "table — alphabet-bounded (10 rows at the fixtures); the "
        "per-vector rank windows are label-PARTITIONED, and the "
        "directory is broadcast"
    ),
    "stats_friedman_daily_types": (
        "top/bottom row_number windows over the per-TYPE rank-sum "
        "table — alphabet-bounded (k rows); the in-day ranking "
        "windows are day-partitioned and the cell frame is "
        "calendar x alphabet bounded"
    ),
    "ev_slo_burn_rate": (
        "trailing-7-day RANGE window over the DAILY frame — "
        "calendar-bounded (~365 rows/year); the fact stream is "
        "pre-reduced by the map-side-combined daily groupBy"
    ),
    "stats_bh_fdr_weekend": (
        "BH rank/step-up windows over the per-TYPE z family — "
        "alphabet-bounded (<= |event types| rows = 5 here) by "
        "construction; the fact stream is pre-reduced by the "
        "weekend-mix agg"
    ),
    "text_length_dup_bias": (
        "quartile rank window over the corpus with a FIXED-WIDTH "
        "integer sort key (the exact-percentile posture; same class "
        "as agg_exact_global_median's justification) — the dup flag "
        "is pre-reduced by the md5 groupBy"
    ),
    "ev_changepoint_binary_seg": (
        "prefix sums over the DAILY frame — calendar-bounded (~365 "
        "rows/year); the fact stream is pre-reduced by the "
        "map-side-combined daily groupBy"
    ),
    "stats_qte_weekend_value": (
        "two rank windows partitioned by the weekend flag — the "
        "exact-percentile posture (fixed-width integer sort key, "
        "two partitions); documented in the docstring"
    ),
    "ev_tenure_churn_hazard": (
        "descending cumsum over the TENURE-WEEK table — rows <= "
        "feed-span/7 (calendar-bounded, ~5 at the fixtures, ~520 for a "
        "10-year feed); the per-user min/max agg shuffles on user_id "
        "before any window"
    ),
    "ev_error_rate_by_load": (
        "rank window over the HOUR-GRAIN load table — rows <= feed "
        "hours (calendar-bounded, ~720/month); event grain never "
        "enters a window"
    ),
    "corpus_token_budget_by_quality": (
        "descending cumsum over the SCORE-BAND table — exactly <= 6 "
        "rows (scores 0,20,..,100) regardless of corpus size"
    ),
    "text_vocab_rank_drift": (
        "re-rank windows over the UNION-OF-TOP-K term set (<= 2*30 "
        "rows by construction, two TakeOrdered cuts + checkpoint); the "
        "vocabulary itself never enters a window"
    ),
    "emb_dim_redundancy_topk": (
        "top-k window over the DIMENSION-PAIR frame — exactly "
        "C(64,2) = 2016 rows regardless of corpus size (map-side "
        "partials absorb the per-vector fan-out)"
    ),
    "customer_value_deciles": (
        "NTILE over the CUSTOMER dimension (orders pre-reduced to one "
        "row per customer — the rfm_segmentation argument) + a 10-row "
        "decile-grain cumulative window on the checkpointed rollup"
    ),
    "sketch_kmv_distinct": (
        "rank over the SKETCH POOLS only: the per-source window reads "
        "the 64-salt-local k-min cut (<= 64*K rows per source "
        "partition) and the union-merge window reads the pooled "
        "distinct hashes (<= sources*K rows) — raw documents never "
        "enter a window; both frames are sketch-sized by construction"
    ),
    "stats_kruskal_wallis_daily": (
        "global rank over the DAILY (date × event-type) frame — "
        "calendar-bounded (~150 rows here, ~18k for a 10-year feed), "
        "localCheckpointed; the fact stream is pre-reduced by the "
        "map-side-combined daily groupBy"
    ),
    "dedup_cluster_pareto": (
        "cumulative window over the TakeOrdered HEAD only (LIMIT "
        "PARETO_TOP_N = 100 rows by construction); the cluster total "
        "is an agg, never a window, and the corpus-sized cluster set "
        "is cut by TakeOrdered before any single-partition stage"
    ),
    "ev_bollinger_breakout": (
        "trailing 7-day window over the DAILY frame — calendar-bounded "
        "(~30 rows here, ~3650 for a 10-year feed); fact stream is "
        "pre-reduced by the daily groupBy"
    ),
    "orders_pareto_cumshare": (
        "rank over the CUSTOMER dimension (orders pre-reduced to one "
        "row per customer — the rfm_segmentation argument) + a 10-row "
        "decile-grain cumulative window"
    ),
    "stats_bootstrap_ci": (
        "row_number over the REPLICA frame: exactly B=100 rows by "
        "construction (one per bootstrap replica), fact stream never "
        "enters the window"
    ),
    "text_vocab_coverage_curve": (
        "rank + running sum over the TOP-32 frame (a TakeOrdered cut — "
        "<=32 rows by construction); the vocabulary itself never enters "
        "a window"
    ),
    "skyline_price_size": (
        "running-min over the per-size min-price frame: ≤|distinct "
        "p_size| rows (~50), fact table never enters the window"
    ),
    "sketch_top_k_heavy_hitters": (
        "rank over the DISTINCT supplier key domain (the fact table is "
        "pre-reduced by the key-grain agg; the domain is the supplier "
        "dimension) — the CMS estimate join is a broadcast of the "
        "bounded counter matrix"
    ),
    "customer_balance_activity_grid": (
        "NTILE over the CUSTOMER dimension (orders pre-reduced to one "
        "row per customer — the rfm_segmentation argument)"
    ),
    "supplier_acctbal_quartile_grid": (
        "NTILE over the SUPPLIER dimension — the smallest table in the "
        "schema; the fact stream never enters the window"
    ),
    "ev_hourly_mad_anomalies": (
        "median/MAD rank windows over the HOURLY frame — "
        "calendar-bounded (~720 rows here, ~88k for a 10-year feed), "
        "localCheckpointed; the fact stream is pre-reduced by the "
        "map-side-combined hourly groupBy"
    ),
    "abc_analysis_parts": (
        "running revenue sum over the part-CATALOG grain (fact stream "
        "pre-reduced to one row per SKU); bounded by catalog size, not "
        "order volume"
    ),
    "rfm_segmentation": (
        "three NTILEs over the customer DIMENSION (orders pre-reduced "
        "to one row per customer); docstring documents the "
        "approx_percentile swap for unbounded key spaces"
    ),
    "agg_exact_global_median": (
        "cum-count over the selection histogram — max(1024, n/2^20) "
        "rows by construction (bucket count scales with n)"
    ),
    "emb_pca_power": (
        "windows over the (d+1)^2-row merged Gram and the d-row "
        "iteration vectors — dimension-bounded after the mapInPandas "
        "partial-Gram pass"
    ),
    "corpus_budget_pack": (
        "cum token mass over the score histogram — max(256, n/2^20) "
        "rows by construction (bucket count scales with n)"
    ),
    "ev_cumulative_unique_users": (
        "running sum over the zero-filled CALENDAR day spine "
        "(days-of-history rows; user/event stream pre-reduced)"
    ),
    "orders_open_concurrency": (
        "running sum over per-day ±1 boundary aggregates — "
        "calendar-bounded step function"
    ),
    "ev_rolling_distinct_users": (
        "running sum over per-day coverage-interval boundaries — "
        "calendar-bounded"
    ),
    "stats_runs_test": (
        "lag/aggregate windows over the DAILY series (orders pre-reduced "
        "to one row per date) — calendar-bounded (~2.4k rows fixture, "
        "~3.7k for a 10-year feed)"
    ),
    "ts_downsample_lttb": (
        "row_number/count over the DAILY series (calendar-bounded) and "
        "the K+2-row anchor frame; the per-bucket argmax window IS "
        "partitioned (by bucket)"
    ),
    "ev_stickiness_dau_mau": (
        "same calendar-bounded coverage-interval core as "
        "ev_rolling_distinct_users"
    ),
    "ev_engagement_concentration": (
        "NTILE over the per-USER activity aggregate (events pre-reduced "
        "to one row per user) + 10-row decile cum"
    ),
    "text_vocab_top": (
        "row_number over the TakeOrderedAndProject top-K output "
        "(VOCAB_TOP_K rows), never the vocabulary"
    ),
    "text_length_quality_grid": (
        "cum-counts over the two scaled selection histograms "
        "(max(1024, n/2^20) rows by construction) — the corpus-grain "
        "NTILE was rewritten to the bounded boundary-row selection "
        "(_ntile_assign_bounded) in r6"
    ),
    "ev_cusum_changepoint": (
        "running sum + index over the zero-filled CALENDAR hour spine "
        "(hours-of-history rows; fact stream pre-reduced to hourly "
        "counts)"
    ),
    "sample_stratified_quota": (
        "remainder rank over the SOURCE dimension (fact stream "
        "pre-reduced to one token-mass row per source)"
    ),
    "ev_late_data_watermark": (
        "prefix-max over the ARRIVAL-HOUR bucket frame "
        "(calendar-bounded); the per-row cummax is partitioned BY "
        "bucket — the fact stream never enters a global window"
    ),
    "corpus_temperature_mix": (
        "dual Hamilton apportionment over the SOURCE dimension (fact "
        "stream pre-reduced to one token-mass row per source — the "
        "sample_stratified_quota frame)"
    ),
}


def count_global_windows(plan: str) -> int:
    """Window nodes whose Arguments carry no partition spec. Formatted
    plans print `Arguments: [fns], [ordering]` for a global ORDERED
    window, `Arguments: [fns], [partition]` for a partitioned unordered
    one (same group count — disambiguated by the ASC/DESC markers only
    ordering groups carry), and `[fns], [partition], [ordering]` for the
    partitioned ordered case. Constant partition keys like lit(1) are
    folded away and land in the global bucket too — correctly: they
    still run single-task. AQE plans repeat the tree (initial + final),
    so counts come out doubled; the findings gate is presence, not
    magnitude."""
    n_global = 0
    lines = plan.splitlines()
    for idx, line in enumerate(lines):
        if not re.match(r"\(\d+\) Window\s*$", line.strip()):
            # WindowGroupLimit nodes repeat the parent Window's spec;
            # the Window node itself is what moves the data
            continue
        for nxt in lines[idx + 1 : idx + 6]:
            nxt = nxt.strip()
            if not nxt.startswith("Arguments:"):
                continue
            body = nxt[len("Arguments:"):].strip()
            groups: list[str] = []
            depth = 0
            start = None
            for pos, ch in enumerate(body):
                if ch == "[":
                    if depth == 0:
                        start = pos
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0 and start is not None:
                        groups.append(body[start : pos + 1])
                        start = None
            if len(groups) <= 1 or (
                len(groups) == 2
                and re.search(r" (ASC|DESC)\b", groups[-1])
            ):
                n_global += 1
            break
    return n_global


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(name: str, plan: str) -> dict:
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "scans": plan.count("Scan parquet") + plan.count("Scan binaryFile"),
        "read_cols": (
            max((len(s.split(",")) for s in read_schemas), default=0)
        ),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        # AQE formatted plans annotate operators with [codegen id : n]
        # instead of WholeStageCodegen(n) wrappers — count distinct spans
        "codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\[codegen id : (\d+)\]", plan))
        ),
        "cartesian": plan.count("CartesianProduct"),
        "python_eval": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapCoGroupsInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("AggregateInPandas"),
        "global_windows": count_global_windows(plan),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PLANS.md")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="audit every registered query")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("plan_audit")
    specs = registry.all_specs()
    if args.all:
        names = list(specs)
    else:
        names = args.names or list(registry.bench_specs()) + [
            "join_asof", "window_range_1h", "sim_ivf", "ev_user_state",
            "q06_forecast_revenue", "q07_volume_shipping", "q14_promo_revenue",
            "pipeline_clean_corpus", "dataset_split_hash", "dedup_keep_best",
            "udaf_geometric_mean", "grouped_zscore", "sim_dup_pairs",
        ]

    rows = []
    sections = []
    problems = []
    for name in names:
        spec = specs.get(name)
        if spec is None:
            continue
        df = spec.builder(spark, args.sf)
        try:
            df.collect()  # AQE: codegen ids + final plan appear post-execution
        except Exception:
            pass
        plan = formatted_plan(df)
        a = audit_one(name, plan)
        rows.append((name, a))
        # full plan text only for the headline set — the property table
        # covers everything; dumping 79 formatted plans buries the signal
        if name in registry.bench_specs() or name in EXPECT_BROADCAST:
            sections.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")
        if a["cartesian"]:
            problems.append(f"{name}: CartesianProduct in plan")
        if a["global_windows"] and name not in GLOBAL_WINDOW_BOUNDED:
            problems.append(
                f"{name}: {a['global_windows']} global window(s) with no "
                "bounded-input justification (GLOBAL_WINDOW_BOUNDED)"
            )
        if name in EXPECT_PUSHED and not a["pushed_filters"]:
            problems.append(f"{name}: expected pushed filters, found none")
        if name in EXPECT_BROADCAST and not a["broadcast_joins"]:
            problems.append(f"{name}: expected a broadcast join, found none")

    lines = [
        "# Physical-plan audit",
        "",
        "Captured with `df.explain('formatted')` at sf0.01 "
        "(plan shape is SF-independent; AQE may re-plan at runtime).",
        "",
        "| query | scans | pushed filters | max read cols | bcast joins |"
        " SMJ | codegen spans | python stages | global windows | cartesian |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        lines.append(
            f"| {name} | {a['scans']} | {a['pushed_filters']} | "
            f"{a['read_cols']} | {a['broadcast_joins']} | {a['smj']} | "
            f"{a['codegen_spans']} | {a['python_eval']} | "
            f"{a['global_windows']}"
            f"{'*' if a['global_windows'] and name in GLOBAL_WINDOW_BOUNDED else ''}"
            f" | {a['cartesian']} |"
        )
    lines.append("")
    gw_used = [n for n, a in rows if a["global_windows"] and n in GLOBAL_WINDOW_BOUNDED]
    if gw_used:
        lines += [
            "`*` = global window allowed: input provably bounded — "
            "justifications:",
            "",
        ]
        lines += [f"- `{n}`: {GLOBAL_WINDOW_BOUNDED[n]}" for n in gw_used]
        lines.append("")
    noted = [n for n, _ in rows if n in PLAN_NOTES]
    if noted:
        lines += ["## Notes", ""]
        lines += [f"- `{n}`: {PLAN_NOTES[n]}" for n in noted]
        lines.append("")
    if problems:
        lines.append("## Findings")
        lines += [f"- **{p}**" for p in problems]
        lines.append("")
    lines += sections
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}; {len(problems)} finding(s)")
    for p in problems:
        print(" -", p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
