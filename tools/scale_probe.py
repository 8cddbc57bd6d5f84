"""Scaling probe: run representative queries at sf0.001 / sf0.01 / sf0.1
(100× data range) and tabulate wall times — direct evidence of how the
plans scale with input volume on a fixed 32-core local session.

    python tools/scale_probe.py [--out SCALING.md]

A healthy distributed plan grows far slower than the data (fixed overhead
amortizes, scans/shuffles parallelize); a pathological one (driver
collects, quadratic candidate generation) shows super-linear growth.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_dba_spark import registry  # noqa: E402
from spark_dba_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
QUERIES = [
    "q01_pricing_summary",       # scan+agg
    "q03_shipping_priority",     # fact⋈fact join
    "ev_tumbling_1h",            # event-time window agg
    "window_running_sum",        # window function
    "dedup_minhash_lsh",         # LSH candidate pipeline
    "sim_cosine_topk",           # vector scoring (Arrow+BLAS)
    "text_quality",              # map-only text stats
    "join_asof",                 # union-tag as-of join
    "text_tfidf",                # explode + two keyed shuffles + window
    "dedup_cc_clusters",         # iterative label propagation (r3)
    "emb_quantize_int8",         # map-only higher-order vector math (r3)
    "window_median_range",       # range self-join holistic window (r5)
    "decontaminate_bloom",       # bloom-prefiltered verify join (r5)
    "text_chunk_overlap",        # map-only posexplode chunking (r5)
    "audit_referential_integrity",  # 6 anti-join FK checks (r5)
    "ev_markov_transitions",     # sequence window + bounded matrix (r5)
    "ts_interpolate_linear",     # LEAD pair + gap-capped sequence fan-out (r5b)
    "orders_open_concurrency",   # boundary-event interval rewrite (r5b)
    "inv_running_balance_capped",  # applyInPandas stateful fold (r5b)
    "emb_pca_power",             # moment pass + dim-bounded iterations (r5b)
    "agg_weighted_median",       # part-keyed price-ladder window (r5b)
    "ev_user_feature_snapshot",  # two keyed aggs + entropy join (r5b)
    "ev_attribution_credit",     # user-keyed range join, windowed credits (r5b)
    "ev_rolling_distinct_users",  # coverage-interval boundary rewrite (r5b)
    "agg_exact_global_median",   # two-pass selection, histogram + bucket sort (r5b)
    "ev_stickiness_dau_mau",     # shared coverage core + daily distinct (r5b)
    "text_length_quality_grid",  # bounded NTILE-by-selection rewrite (r6)
    "corpus_budget_pack",        # scaled score-histogram selection (r6)
    "dedup_canonical_corpus",    # CC + keep-best funnel emit (r6 new)
    "mm_neardup_hamming",        # block-hash band join near-dup (r6 new)
    "stats_theil_sen",           # bucket-selection slope median (r7 rewrite)
    "mm_clip_joint_align",       # Arrow two-tower forward pass (r7 new)
    "mm_video_keyframe_dedup",   # keyframe band join + CC contraction (r7 new)
    "mm_audio_fingerprint_match",  # landmark band join (r7 new)
    "mm_caption_retrieval",      # broadcast-probe cross-modal top-k (r7 new)
    "sim_pq_adc",                # PQ encode+ADC Arrow pass (r7-late, VERDICT #7)
    "text_winnow_fingerprint",   # positional winnowing HOF pass (r7-late)
    "mm_modality_quota_pack",    # per-modality bucketed selection (r7)
    "emb_kmeans_lloyd",          # fixed-point Lloyd iterations (r7 oracle)
    "merge_into_semantics",      # full-outer merge, BIGINT cents (r8 rewrite)
    "sim_knn_label_vote",        # broadcast-probe kNN + vote (r8 new)
    "ev_late_data_watermark",    # bucketed prefix-max watermark replay (r8 new)
    "stats_ks_two_sample",       # bucketed two-sample CDF machinery (r8b new)
    "stats_mann_whitney_u",      # shared two-pass rank-sum core (r8b new)
    "text_bpe_first_merge",      # vocabulary-contraction pair counts (r8b new)
    "text_heaps_vocab_growth",   # first-occurrence growth curve (r8b new)
    "corpus_temperature_mix",    # dual Hamilton over source frame (r8b new)
    "emb_energy_prefix",         # one-pass conditional fixed-point agg (r8b)
    "emb_nearest_centroid_confusion",  # broadcast centroid scoring (r8b new)
    "emb_pq_distortion",         # codeword-join distortion audit (r8b new)
    "emb_random_projection_audit",  # JL sign-join projection pass (r8b new)
    "sketch_count_min_deterministic",  # md5 CMS counter matrix (r8b new)
    "graph_khop_reach",          # unrolled frontier-join BFS (r8b new)
    "ev_stream_static_enrich",   # broadcast dim enrich rollup (r8b new)
    "q13_customer_distribution",  # zero-preserving two-level count dist (r8c)
    "stats_spearman_rank_corr",  # bucketed-prefix permutation ranks (r8c)
    "stats_kendall_daily",       # calendar-bounded pair concordance (r8c)
    "text_mattr_diversity",      # interval-contribution sliding distinct (r8c)
    "dedup_threshold_sweep",     # one-pass Jaccard yield curve (r8c)
    "graph_degree_assortativity",  # sqrt-free symmetric-edge Pearson (r8c)
    "ev_fano_overdispersion",    # zero-hour-free variance screen (r8 snapshot)
    "ev_gap_log2_histogram",     # bit-length gap buckets (r8 snapshot)
    "orders_seasonal_index",     # 12-key share indices (r8 snapshot)
    "drift_priority_mix_tv",     # densified categorical TV drift (r8 snapshot)
    "stats_bootstrap_ci",        # 4-lane md5 Poisson bootstrap (r8 snapshot)
    "dedup_substring_spans",     # stride-1 span fingerprints (r9 new)
    "sketch_hll_registers",      # deterministic HLL register arrays (r9 new)
    "stats_equidepth_histogram",  # exact ANALYZE boundaries (r9 new)
    "stats_runs_test",           # runs-test direction sequence (r9 new)
    "text_source_vocab_jaccard",  # word-keyed source overlap (r9 new)
    "text_boundary_overlap",     # edge-fingerprint equi-join (r9 new)
    "text_rake_keywords",        # stopword-island RAKE scores (r9 new)
    "ts_downsample_lttb",        # bucket-anchored LTTB argmax (r9 new)
    "emb_km_diag_assign",        # kmeans loop, label-only readout (r9 twin)
    "mm_audio_vad_segments",     # integer-energy VAD islands (r9b new)
    "emb_mmr_diversified_topk",  # integer MMR greedy re-rank (r9b new)
    "dedup_prefix_filter_join",  # complete AllPairs prefix filter (r9b new)
    "graph_common_neighbors",    # wedge link prediction (r9b new)
    "emb_margin_audit",          # all-pairs label margins (r9b new)
    "mm_video_scene_cuts",       # frame-delta scene islands (r9b new)
    "orders_seasonal_naive_backtest",  # year-shift backtest (r9c new)
    "orders_fulfillment_latency_bands",  # exact latency bands (r9c new)
    "dedup_longest_dup_span",    # interval-union dup regions (r10 new)
    "doc_span_decontamination",  # stream-static eval-index hits (r10 new)
    "text_boilerplate_heads",    # shared-head template detection (r10 new)
    "sim_lsh_multiprobe",        # Hamming-1 probe ANN ranking (r10 new)
    "emb_sign_sketch_agreement",  # sign-sketch Hamming calibration (r10 new)
    "graph_kcore_peel",          # 4-round bounded 2-core peel (r10 new)
    "graph_label_propagation",   # sync LPA communities (r10 new)
    "graph_global_transitivity",  # wedges vs triangles (r10 new)
    "graph_degree_histogram",    # log2 degree bands (r10 new)
    "text_bpe_merge_sequence",   # 4 unrolled BPE merges (r10 new)
    "stats_cohens_kappa_langid",  # chance-corrected agreement (r10 new)
    "sketch_bloom_fpr_audit",    # md5 bloom measured FPR (r10 new)
    "stats_kruskal_wallis_daily",  # k-group daily rank test (r10 new)
    "text_char_class_profile",   # char-class accounting (r10 new)
    "text_consonant_runs",       # consonant-run gibberish probe (r10 new)
    "ts_ohlc_candles",           # daily OHLC endpoints (r10 new)
    "ev_bollinger_breakout",     # cross-multiplied 2-sigma bands (r10 new)
    "ev_lifecycle_accounting",   # weekly growth ledger (r10 new)
    "orders_pareto_cumshare",    # revenue decile cumshare (r10 new)
    "ev_session_percentiles",    # bucketed-rank session tails (r10 new)
    "window_topk_with_ties",     # RANK with-ties cut (r10 new)
    "mm_payload_byte_histogram",  # hex-pair byte bands (r10 new)
    "mm_payload_rle_compress",   # adjacent-byte run counts (r10 new)
    "mm_chunk_manifest",         # multipart chunk ledger (r10 new)
    "q21_waiting_supplier_adapted",  # sole-latest-shipper Q21 (r10 new)
    "q22_dormant_value_adapted",  # dormant-value Q22 (r10 new)
    "text_vocab_coverage_curve",  # top-k occurrence coverage (r10b new)
    "dedup_shingle_df_profile",  # shingle DF prune telemetry (r10b new)
    "dedup_cluster_size_histogram",  # CC size bands (r10b new)
    "orders_rfm_migration",      # segment migration matrix (r10b new)
    "ev_hour_of_day_profile",    # diurnal type profile (r10b new)
    "sketch_hll_reaggregate",    # deterministic HLL rollup ladder (r11 upgrade)
    "text_dup_region_removal",   # cleaned-corpus region cut (r11 new)
    "text_dsir_importance",      # DSIR hashed-ngram masses (r11 new)
    "sim_ivfpq_compound",        # IVF routing + PQ-ADC rerank (r11 new)
    "text_tokenizer_fertility",  # subword/byte budget audit (r11 new)
    "dedup_paragraph_minhash",   # block-grain MinHash LSH (r11 new)
    "text_gopher_gates",         # Gopher rule bundle flags (r11 new)
    "text_rarity_outliers",      # rare-df outlier profile (r11 new)
    "text_simpson_concentration",  # integer Simpson index (r11 new)
    "stats_chi_square_source_length",  # dense chi-square cells (r11 new)
    "text_contamination_by_source",  # span-decon source rollup (r11 new)
    "dedup_cross_source_matrix",  # source-pair dup matrix (r11 new)
    "graph_component_density",   # per-CC edge density (r11 new)
    "emb_binary_hamming_topk",   # packed-sign Hamming ANN (r11 new)
    "emb_knn_label_homophily",   # top-k label agreement (r11 new)
    "emb_norm_profile_by_label",  # grid-integer norm audit (r11 new)
    "emb_centroid_shift_ab",     # parity-half centroid shift (r11 new)
    "ev_haar_energy_hourly",     # dyadic Haar detail energy (r11 new)
    "ev_value_records",          # running-record accounting (r11 new)
    "ev_hourly_value_percentiles",  # per-hour type-1 tails (r11 new)
    "customer_value_deciles",    # exact-cents Lorenz table (r11 new)
    "stats_levene_brand_price",  # Brown-Forsythe variance F (r11 new)
    "orders_yoy_growth",         # YoY monthly revenue delta (r11 new)
    "sketch_cms_heavy_change",   # two-half CMS heavy change (r11 new)
    "sketch_kmv_distinct",       # bottom-k theta union merge (r11 new)
    "mm_payload_entropy_proxy",  # byte collision entropy proxy (r11 new)
    "mm_payload_magic_profile",  # magic-byte format audit (r11 new)
    "mm_byte_bigram_topk",       # order-2 byte signature (r11 new)
    "text_vocab_rank_drift",     # head-vocab footrule drift (r11b new)
    "text_term_burstiness",      # Fano factor head terms (r11b new)
    "graph_local_clustering",    # per-node LCC wedges (r11b new)
    "emb_dim_redundancy_topk",   # top-|cov| dim pairs (r11b new)
    "ev_markov_order2",          # second-order transitions (r11b new)
    "ev_user_hour_concentration",  # diurnal Simpson per user (r11b new)
    "stats_permutation_diff",    # md5 randomization test (r11b new)
    "sketch_bloom_capacity_sweep",  # bloom sizing curve (r11b new)
    "orders_weekday_index",      # ISO dow seasonality (r11b new)
    "mm_byte_delta_profile",     # byte-delta smoothness bands (r11b new)
    "sketch_top_k_heavy_hitters",  # CMS-ranked heavy hitters (r12 upgrade)
    "dedup_semantic_kmeans",     # SemDedup cluster-bucketed (r12 new)
    "text_bigram_lm_surprisal",  # bigram-LM fluency proxy (r12 new)
    "text_repetition_gates",     # Gopher dup n-gram gates (r12 new)
    "dedup_paragraph_cleaned_corpus",  # block-grain cleaned corpus (r12)
    "text_eval_split_leakage",   # split + dup-graph leakage (r12 new)
    "text_cooccur_lift_topk",    # head-term lift pairs (r12 new)
    "text_positional_drift",     # front-vs-back term bias (r12 new)
    "text_head_tail_selfsim",    # half/half vocab Jaccard (r12 new)
    "text_char_bigram_topk",     # per-lang char bigrams (r12 new)
    "ev_value_cusum_extrema",    # integer CUSUM extrema (r12 new)
    "ev_dow_hour_heatmap",       # dow x hour grid (r12 new)
    "ev_type_affinity_skew",     # over-indexing users (r12 new)
    "ev_daily_newcomer_share",   # first-seen-day share (r12 new)
    "ev_peak_hour_ratio",        # peak-to-mean load (r12 new)
    "orders_price_band_month_mix",  # log2 price-band drift (r12 new)
    "orders_repeat_customer_share",  # first-vs-repeat split (r12 new)
    "lineitem_unit_price_outliers",  # brand median outliers (r12 new)
    "orders_month_end_loading",  # month-end order share (r12 new)
    "emb_quantile_clip_bounds",  # per-dim p1/p99 clip (r12 new)
    "emb_grid_cell_density",     # sign-cell occupancy (r12 new)
    "emb_centroid_margin_bands",  # top-2 centroid margins (r12 new)
    "emb_dim_sign_balance",      # per-dim sign balance (r12 new)
    "sketch_kmv_setops",         # theta union/intersection (r12 new)
    "stats_capture_recapture",   # Lincoln-Petersen estimate (r12 new)
    "mm_chunk_dedup_cross",      # cross-payload chunk dedup (r12 new)
    "dedup_component_cohesion",  # per-CC edge-jaccard stats (r12b new)
    "graph_local_bridges",       # common-neighbors per edge (r12b new)
    "emb_bucket_pair_cos_histogram",  # bucket-pair cos bands (r12b new)
    "mm_payload_byte_stats",     # per-asset byte triage (r12b new)
    "ev_type_transition_gap_median",  # transition gap medians (r12b new)
    "customer_balance_activity_grid",  # decile x activity grid (r12b)
    "text_source_bigram_uniqueness",  # bigram provenance value (r12b)
    "stats_sign_test_user_value",  # paired sign test (r12b new)
    "ev_hourly_mad_anomalies",   # median/MAD hourly flags (r12b new)
    "supplier_acctbal_quartile_grid",  # quartile x nation grid (r12b)
    "text_dedup_inflation_by_source",  # removable token mass (r12c new)
    "sim_ivf_routing_balance",   # IVF list/probe balance (r12c new)
    "stats_blomqvist_beta_brand",  # medial correlation (r12c new)
    "dedup_band_precision_profile",  # per-band LSH precision (r12c new)
    "ev_hourly_session_load",    # concurrent sessions/hour (r12c new)
    "stats_cramers_v_assoc",     # brand x flag association (r12d new)
    "dedup_cluster_pareto",      # exact-dup waste curve (r12d new)
    "customer_priority_transitions",  # priority Markov matrix (r12d)
    "ev_weekend_lift",           # weekend seasonality lift (r12d new)
    "mm_chunk_cdc_profile",      # CDC chunk dedup profile (r12d new)
    "ev_hourly_load_gini",       # hourly-load Gini per type (r12e new)
    "sketch_hll_precision_sweep",  # HLL m-sweep tuning table (r12e)
    "join_asof_tolerance",       # tolerance as-of join (r12e new)
    "emb_cluster_silhouette",    # per-cluster silhouette (r12e new)
    "lineitem_promo_did",        # discount DiD 4-cell grid (r12f new)
    "graph_neardup_modularity",  # source modularity of dup graph (r12f)
    "text_char_entropy_by_source",  # char entropy screen (r12f new)
    "emb_pq_codebook_utilization",  # PQ code balance audit (r12g new)
    "graph_neardup_conductance",  # per-source normalized cut (r12g)
    "ev_session_bounce_profile",  # daily bounce share (r12g new)
    "text_pii_pattern_audit",    # PII exposure screen (r13 new)
    "text_composite_quality_score",  # 5-gate composite histogram (r13)
    "mm_cdc_snapshot_delta",     # cross-snapshot CDC delta (r13 new)
    "ev_interarrival_burstiness",  # gap burstiness per type (r13 new)
    "ev_interval_coverage_join",  # bucketed interval join (r13 new)
    "sketch_grid_quantile_error",  # grid-quantile error cert (r13 new)
    "text_pii_redaction_corpus",  # typed-placeholder redaction (r13b)
    "mm_chunk_size_quantiles",   # CDC chunk-length tails (r13b new)
    "text_bigram_entropy_rate",  # bigram entropy rate (r13b new)
    "join_asof_forward",         # next-order forward as-of (r13b new)
    "ev_tenure_churn_hazard",    # tenure survival table (r13b new)
    "emb_cell_purity_by_label",  # sign-cell label purity (r13b new)
    "mm_magic_mismatch_audit",   # magic-byte container audit (r13b)
    "emb_anisotropy_mean_vector",  # mean-vector anisotropy (r13c new)
    "text_source_tf_cosine_matrix",  # source TF cosine matrix (r13c)
    "sketch_linear_counting_error",  # LC estimate vs exact (r13c new)
    "ev_error_rate_by_load",     # error share by load decile (r13c)
    "stats_theil_index_by_nation",  # Theil decomposition (r13c new)
    "ev_type_hourly_corr_matrix",  # type-pair hourly Pearson (r13d)
    "stats_evt_gumbel_daily_max",  # Gumbel daily-max fit (r13d new)
    "mm_chunk_boundary_stability",  # CDC shift survival (r13d new)
    "corpus_token_budget_by_quality",  # quality-bar budget curve (r13d)
    "corpus_lang_rebalance_plan",  # language mixture knob (r13e new)
    "orders_hhi_monthly_trend",  # monthly HHI concentration (r13e)
    "ev_order_event_reconciliation",  # two-ledger recon (r13f new)
    "ev_attribution_window_sweep",  # attribution sensitivity (r13f)
    "corpus_dup_quality_crosstab",  # dup x quality cross-tab (r13f)
    "ev_zipf_user_activity",     # user-activity Zipf fit (r13f new)
    "corpus_pack_efficiency_by_window",  # context-length sizing (r13g)
    "mm_payload_periodicity_probe",  # byte-lag autocorr probe (r13g)
    "stats_weekend_mix_ztest",   # weekend-mix two-prop z (r13g new)
    "emb_intrinsic_dim_twonn",   # TwoNN intrinsic dim (r13g new)
    "orders_pvm_decomposition",  # price-volume-mix bridge (r14 new)
    "stats_jackknife_influence",  # delete-one-nation LOO means (r14)
    "stats_power_analysis_mde",  # A/B MDE power readout (r14 new)
    "ev_seasonality_strength",   # hour-of-day eta^2 (r14 new)
    "ev_sequence_pattern_match",  # capped regex sequence lib (r14 new)
    "mm_prefix_hash_audit",      # prefix-vs-full hash audit (r14 new)
    "emb_probe_hubness",         # probe 5-NN hubness graph (r14 new)
    "emb_prefix_dim_recall",     # Matryoshka recall sweep (r14 new)
    "dedup_lsh_band_planner",    # (bands x rows) cost/recall grid (r14)
    "dedup_method_confusion",    # MinHash vs SimHash cells (r14 new)
    "ev_slo_burn_rate",          # SLO burn multiwindow alerts (r14b new)
    "stats_cochran_armitage_trend",  # weekly proportion trend z (r14b)
    "stats_mcnemar_weekend_purchase",  # paired discordant cells (r14b)
    "stats_bh_fdr_weekend",      # BH step-up via erfc literals (r14b)
    "emb_kmeans_elbow",          # Lloyd inertia k-sweep (r14b new)
    "sim_lsh_recall_by_corpus_scale",  # recall vs corpus scale (r14b)
    "emb_sq_bits_sweep",         # SQ bit-width RMSE curve (r14c new)
    "stats_simpson_paradox_probe",  # aggregation-reversal audit (r14c)
    "ev_lead_lag_xcorr",         # hourly lead-lag Pearson (r14c new)
    "stats_qte_weekend_value",   # decile treatment effects (r14c new)
    "sim_ann_rank_quality",      # LSH MRR/nDCG eval (r14c new)
    "dedup_shingle_size_sweep",  # shingle-n cost/yield curve (r14c)
    "stats_weekend_effect_heterogeneity",  # Cochran Q / I^2 (r14d new)
    "stats_effect_size_weekend",  # Cohen d / Hedges g (r14d new)
    "stats_interrupted_time_series",  # segmented pre/post OLS (r14d)
    "text_length_dup_bias",      # dup rate by length quartile (r14d)
    "ev_changepoint_binary_seg",  # argmax between-SS split (r14d new)
    "mm_dedup_net_savings",      # staged dedup storage ROI (r14e new)
    "graph_adamic_adar",         # hub-discounted link pred (r14e new)
    "stats_hash_split_fairness",  # md5 lane chi-square audit (r14e)
    "orders_cohort_ndr",         # cohort net dollar retention (r14e)
    "ev_type_mix_drift_weekly",  # weekly mix TV drift (r14e new)
    "orders_littles_law_audit",  # bucket-spine L=lambda*W audit (r14f new)
    "stats_nelson_aalen_interarrival",  # gap survival hazard (r14f new)
    "emb_triplet_margin_rate",   # md5 triplet margins (r14f new)
    "sketch_ams_f2_error",       # AMS F2 certificate (r14f new)
    "corpus_dedup_quality_shift",  # dedup-induced mix TV (r14f new)
    "orders_abc_migration",      # YoY ABC class migration (r14g new)
    "dedup_simhash_bit_bias",    # fingerprint bit audit (r14g new)
    "mm_payload_chi2_uniformity",  # byte-band chi2 verdict (r14g new)
    "text_js_divergence_sources",  # pairwise JSD matrix (r14g new)
    "mm_byte_cond_entropy",      # conditional byte entropy (r14h new)
    "text_burrows_delta",        # stylometric delta matrix (r14h new)
    "ev_hurst_variance_plot",    # variance-time Hurst probe (r14h new)
    "text_yules_k",          # Yule's K richness constant (r14i new)
    "ev_max_drawdown_daily", # peak-relative daily drawdown (r14i new)
    "stats_ljung_box_daily", # Ljung-Box whiteness cascade (r14i new)
    "emb_jl_projection_distortion", # JL sign-matrix distortion (r14i new)
    "supplier_single_source_exposure", # single-source revenue risk (r14i)
    "customer_interpurchase_regularity", # CV2 rhythm bands (r14i new)
    "stats_mann_kendall_trend", # tie-corrected MK trend (r14i new)
    "stats_dickey_fuller_daily", # DF unit-root probe (r14i new)
    "mm_payload_ks_uniform", # byte KS sup-deviation (r14i new)
    "sim_rank_biased_overlap", # RBO of LSH vs exact (r14i new)
    "graph_rich_club_coefficient", # rich-club density sweep (r14i new)
    "emb_coverage_radius_net", # epsilon-net covering radii (r14i new)
    "stats_jarque_bera_daily", # JB normality moments (r14j new)
    "emb_fisher_separability", # between/within scatter ratio (r14j new)
    "ev_topk_turnover_weekly", # weekly top-50 Jaccard churn (r14j new)
    "mm_byte_runs_randomness", # high/low byte runs test (r14j new)
    "stats_kuiper_hour_uniformity", # circular clock-grid Kuiper (r14j new)
    "orders_tukey_fence_outliers", # doubled-cents Tukey fences (r14j new)
    "orders_revenue_bridge_monthly", # customer-grain waterfall (r14k new)
    "stats_cramer_von_mises_weekend", # value-grain CvM (r14k new)
    "stats_mood_median_weekend", # grand-median 2x2 test (r14k new)
    "ev_user_day_islands",   # gaps-and-islands streaks (r14k new)
    "orders_abc_xyz_matrix", # ABC x CV-band matrix (r14k new)
    "text_collocation_pmi",  # PMI collocation top-20 (r14k new)
    "stats_circular_resultant_hour", # Rayleigh resultant length (r14l new)
    "orders_fiscal_445_calendar", # 4-4-5 fiscal rollup (r14l new)
    "text_unicode_script_mix", # codepoint-band script mix (r14l new)
    "stats_page_trend_test", # Page L ordered trend (r14l new)
    "ev_session_peak_concurrency", # minute sweep-line peak (r14l new)
    "ev_capacity_shed_whatif", # p90-cap shed allocation (r14l new)
    "scalar_csv_roundtrip",  # to_csv/from_csv identity (r14m new)
    "orders_line_count_dispersion", # basket dispersion index (r14m new)
    "emb_dim_variance_participation", # variance PR effective dims (r14m)
    "stats_dow_hour_independence", # 7x24 grid chi-square (r14m new)
    "orders_crk_concentration", # CR4/8/20 revenue shares (r14n new)
    "ev_hurst_rescaled_range", # R/S Hurst dyadic blocks (r14n new)
    "stats_rate_ratio_weekend", # exposure-day rate ratio (r14n new)
    "sketch_hll_intersection_error", # HLL inclusion-exclusion (r14n new)
    "lineitem_discount_response_curve", # discount qty lift curve (r14n)
    "emb_ingestion_drift_halves", # ordered-vs-parity drift (r14n new)
    "dedup_lsh_bucket_skew", # band bucket load shape (r14o new)
    "lineitem_return_rate_drivers", # brand return-rate lift (r14o new)
    "ev_hill_tail_index",    # Hill top-k tail exponent (r14o new)
    "mm_header_body_entropy", # positional entropy split (r14o new)
    "stats_median_test_nations", # Brown-Mood k-group test (r14o new)
    "text_lang_script_agreement", # lang vs script modal audit (r14o new)
]

# Per-query footnotes rendered under the table: context the growth column
# alone can't carry (e.g. result-cardinality-bound queries where collect()
# measures shipping, not compute).
NOTES = {
    "ts_interpolate_linear": (
        "output is CORPUS-SIZED by design (hourly grid per user: 9.6k / "
        "99k / 984k rows — exactly linear), so this row measures driver "
        "collect() of the result, not the plan: recomputed with count() "
        "the walls are 0.66 / 0.66 / 0.81 s across the same 100× — flat. "
        "The LEAD fan-out is gap-capped (<=48 rows/pair; VERDICT r8 #4); "
        "at 100 TB this query writes to a sink instead of collecting."
    ),
    "ts_downsample_lttb": (
        "the inverse posture to ts_interpolate_linear: output is "
        "CONSTANT-sized (62 rows at any SF) because downsampling is the "
        "whole point — the collect() measurement is honest here."
    ),
    "mm_chunk_manifest": (
        "output is CORPUS-SIZED by design (one manifest row per "
        "128-byte chunk: ~1.4k / 14k rows at sf0.01/0.1), so this row "
        "partly measures driver collect() of the ledger; at 100 TB the "
        "manifest writes to a sink."
    ),
    "doc_span_decontamination": (
        "output is one row per TRAINING doc (linear in corpus); the "
        "compute is the map-side fingerprint stream against a "
        "broadcast eval index."
    ),
    "text_dup_region_removal": (
        "output IS the cleaned corpus (one full-text row per doc — "
        "corpus-sized by design), so this row partly measures driver "
        "collect() of the texts; at 100 TB the cleaned corpus writes "
        "to a sink. The compute is the dedup_longest_dup_span region "
        "dataflow plus a map-side indexed-HOF cut."
    ),
    "dedup_paragraph_cleaned_corpus": (
        "output IS the cleaned corpus (one full-text row per doc — "
        "corpus-sized by design, the text_dup_region_removal posture), "
        "so this row partly measures driver collect() of the texts; at "
        "100 TB the cleaned corpus writes to a sink. The compute is the "
        "shared paragraph-LSH pair machinery plus a map-side indexed-"
        "HOF block cut."
    ),
    "mm_payload_byte_stats": (
        "output is one triage row per ASSET (linear in corpus); the "
        "compute is one map-side HOF pass over hex pairs — at 100 TB "
        "this is a scan-bound write to a sink, not a collect."
    ),
    "text_bigram_lm_surprisal": (
        "output is one row per DOC (linear in corpus); the compute is "
        "the bigram explode + two count joins — the inverted-index "
        "posture; at 100 TB the per-doc scores write to a sink."
    ),
    "text_pii_redaction_corpus": (
        "output IS the redacted corpus (one row per doc with the "
        "redacted-text md5 — corpus-sized by design), so this row "
        "partly measures driver collect(); at 100 TB the redacted "
        "corpus writes to a sink. The compute is four chained "
        "codegen'd regexp passes — zero shuffles."
    ),
    "ev_interval_coverage_join": (
        "output is one row per EVENT (linear in corpus) — this row "
        "partly measures driver collect(); the compute is the "
        "hour-bucket equi-join (<=2 buckets per window), never an "
        "inequality cross product. At 100 TB the annotated events "
        "write to a sink."
    ),
    "join_asof_forward": (
        "output is one row per EVENT (linear; the join_asof posture) — "
        "partly a collect() measurement; the compute is one union-tag "
        "reversed-window pass per key."
    ),
    "decontaminate_bloom": (
        "the wall is dominated by the ONE-TIME eager bitset-build job "
        "(eval shingles -> distinct -> BIT_OR -> <=2048-row collect), "
        "profiled for VERDICT r10 #5: ~2.6s of a ~3.7s warmed first "
        "run, re-running the built op costs ~1.1s; an upstream "
        "repartition was A/B-tested and rejected (+0.6s). The build "
        "scales with the EVAL SUITE, not the train corpus — constant "
        "at 100 TB."
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.md")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("scale_probe", driver_memory="8g")
    specs = registry.all_specs()

    # warm all shapes at the smallest SF
    for name in QUERIES:
        specs[name].builder(spark, "/root/testdata/sf0.001").collect()

    table: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        table[name] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = min(
                _timed(specs[name].builder, spark, sf_dir)
                for _ in range(args.runs)
            )
            table[name][sf] = best

    lines = [
        "# Scaling probe (local[32], best of 2 runs, shapes pre-warmed)",
        "",
        "Wall seconds per query as the data grows 10× and 100×. The last",
        "column is the wall-time growth across a 100× data increase —",
        "values far below 100 mean fixed overheads dominate and the",
        "distributed plan absorbs the scale.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | wall growth @100× data |",
        "|---|---|---|---|---|",
    ]
    noted = []
    for name, row in table.items():
        growth = row["0.1"] / row["0.001"] if row["0.001"] > 0 else float("inf")
        mark = ""
        if name in NOTES:
            noted.append(name)
            mark = f" [^{len(noted)}]"
        lines.append(
            f"| {name}{mark} | {row['0.001']:.3f} | {row['0.01']:.3f} | "
            f"{row['0.1']:.3f} | {growth:.1f}× |"
        )
    if noted:
        lines.append("")
        for i, name in enumerate(noted, 1):
            lines.append(f"[^{i}]: **{name}** — {NOTES[name]}")
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    return 0


def _timed(builder, spark, sf_dir) -> float:
    t0 = time.time()
    builder(spark, sf_dir).collect()
    return time.time() - t0


if __name__ == "__main__":
    raise SystemExit(main())
