"""The round→driver-window map — single source of truth.

The external driver verifies only the first ``DRIVER_WINDOW`` entries
of ``all_specs()`` against the DuckDB oracle each round (observed in
CORRECTNESS_r01..r04: keys == all_specs()[:50]).  Registration order
is therefore a CONTRACT, and the window must ROTATE between rounds so
cumulative driver coverage grows instead of re-checking the same 50.

Everything round-shaped lives HERE so a rotation is one edit:

* ``WINDOWS[r]``   — the exact 50-name window pinned for round ``r``.
* ``REPROOFS[r]``  — the subset of ``WINDOWS[r]`` that already had a
  driver row before round ``r`` (red rows being re-proven, or green
  rows whose PLAN was rewritten since their last check).  The contract
  test asserts the window re-checks exactly these and nothing else.
* ``CURRENT_ROUND`` — the round whose window registers first in
  ``all_specs()``.
* ``PRESTAGE[r]`` — the queries that will still be driver-unchecked
  going INTO round ``r``'s rotation: the never-checked remainder of
  earlier rounds plus any queries added during round ``r - 1`` (a new
  QuerySpec's first possible driver row is the round after the one
  that added it).  Round ``r``'s window is built from ``PRESTAGE[r]``
  + re-proof slots.

``tests/test_contract_shapes.py`` derives its assertions from this
map (checked-set scoped to CORRECTNESS files of rounds strictly
before ``CURRENT_ROUND``), so committing the current round's own
results file can never turn the suite red again (the r3 post-mortem).

ROTATION-DEBT ARITHMETIC (pin from the round-10 verdict, item 8):
round ``N``'s window must fit PRESTAGE[N] (everything added during
round ``N - 1``) plus every re-proof the fingerprint diff demands,
inside the 50-slot window.  So the standing budget is::

    len(R{N+1}_PRESTAGE)  <=  50 - (expected re-proofs next round)

Re-proof demand is historically small (0-4 plan-changed rows per
round) but cumulative-closure rounds also want slack to re-prove the
STALEST green rows, so the working cap on one round's additions is
**~32 new QuerySpecs** — that leaves >= 18 slots, enough for every
plan-changed row plus a stale-row battery.  Exceeding 32 means round
N + 1 cannot simultaneously close cumulative coverage and re-prove
its plan changes; don't.
"""

from __future__ import annotations

DRIVER_WINDOW = 50

CURRENT_ROUND = 12

# Round 12: the 14 never-driver-checked queries (all 8 surviving
# R12_PRESTAGE entries from round 11 — the 9th, corpus_tokenizer_
# fertility, was retired this round before ever taking a driver row —
# plus the 6 round-12-session additions, registered and locally
# oracle-verified before this rotation ran: the R11 in-window
# precedent) + 36 re-proof slots.  ``rotation.py``'s mechanized
# proposal flagged THREE plan-changed candidates, all three this
# round's own directed fixes: ``eval_cochrans_q`` (DECIMAL/HUGEINT
# statistic numerator, 4a12eeecdc57ca8b → 0c6db53858c3e438),
# ``eval_wilcoxon`` (the two-phase ranged_cumsum prefix sum,
# 25b45ca312607399 → 86f68127d38cea1a) and ``text_tokenizer_fertility``
# (absorbed the retired corpus duplicate's n_chars/
# chars_per_token_milli columns, dec14b3beadb0ede → 94d461183570310b).
# NOTE the widened checkpoint blind spot: eval_wilcoxon,
# eval_mann_whitney and eval_lift_table now run their prefix/rank
# phases through ranged_cumsum/ranged_rank, whose
# _materialize_for_multipass truncates the analyzed plan with a lazy
# localCheckpoint — future upstream changes to those operators'
# CELL-BUILDING stages will NOT move their fingerprints; re-proof them
# manually whenever wilcoxon/mann-whitney/lift cell logic changes (the
# round-11 pipeline_semantic_dedup lesson).  The remaining 33 slots
# reconfirm the stalest green rows (the r4 func/olap/gate battery,
# then the r5-stamped geo/dedup/text/pipeline battery).  This window
# closes cumulative driver coverage at 361/361 — every registered
# query, including this round's own additions, will have a green
# driver row.
_R12_WINDOW: tuple[str, ...] = (
    # The 14 never-driver-checked queries.
    "text_mixed_script",
    "text_encoding_anomaly",
    "corpus_heaps_curve",
    "corpus_tv_distance",
    "events_trend_test",
    "events_pettitt_changepoint",
    "events_runs_test",
    "events_seasonal_naive",
    "eval_lift_table",
    "eval_ks_test",
    "eval_mann_whitney",
    "eval_weighted_kappa",
    "mlprep_smd_balance",
    "eval_bradley_terry",
    # Plan-changed re-proofs (this round's directed fixes).
    "eval_cochrans_q",
    "eval_wilcoxon",
    "text_tokenizer_fertility",
    # Reconfirms: the stalest green rows (r4 battery, then r5).
    "profile_gini_impurity",
    "func_date_battery",
    "func_string_battery",
    "func_null_battery",
    "func_bitwise_battery",
    "func_try_battery",
    "olap_pareto_abc",
    "olap_top_movers",
    "gate_sequence_gaps",
    "ref_a1_dissolve_attach",
    "geo_a1_dissolve",
    "geo_j3_erase",
    "geo_sliver_fix",
    "geo_j2_union_overlay",
    "dedup_connected_components",
    "dedup_minhash_lsh_pairs",
    "dedup_cluster_keeper",
    "pipeline_dedup_yield",
    "text_url_canonicalize",
    "olap_keyset_page",
    "text_fingerprint",
    "pipeline_training_data",
    "text_zscore_nchars",
    "text_rarity_score",
    "eval_lang_id_confusion",
    "corpus_vocab_coverage",
    "mlprep_curriculum_phases",
    "func_array_set_battery",
    "mlprep_hash_features",
    "mlprep_one_hot_segments",
    "pipeline_shard_assign",
    "pipeline_mixture_resample",
    "pipeline_mixture_upsample",
)

# Round 11: the 31 never-driver-checked queries (all 18 R11_PRESTAGE
# from round 10 + the 13 round-11-session additions, registered and
# locally oracle-verified before this rotation ran, so they take
# their driver rows THIS round instead of waiting a cycle) + 19
# re-proof slots.  ``rotation.py``'s mechanized proposal flagged ONE
# plan-changed candidate — ``dedup_embedding_cosine``
# (3abcbc21e6fc32c5 → be4f20191f6b1175, the round-11 LSH bucket cap);
# ``pipeline_semantic_dedup`` rides the same capped chain but its
# analyzed plan is truncated at connected_components' localCheckpoint
# boundary, so the fingerprint CANNOT see the change — it gets a
# manual re-proof slot on the same grounds (the checkpoint-blindness
# is recorded here so future rotations re-proof checkpoint-hidden
# consumers whenever their upstream operator's plan changes).  The
# remaining 17 slots reconfirm the stalest green rows (r4-stamped
# events/profile battery; profile_gini_impurity, the 18th stale
# proposal entry, yielded its slot to the manual re-proof).  This
# window closes cumulative driver coverage at 347/347 — every
# registered query, including this round's own additions, will have
# a green driver row.
_R11_WINDOW: tuple[str, ...] = (
    # The 31 never-driver-checked queries.
    "dedup_winnowing",
    "sim_lsh_recall_audit",
    "text_sentence_dedup",
    "text_loop_detection",
    "text_script_profile",
    "text_ngram_novelty",
    "mm_image_dhash",
    "mm_dhash_near_pairs",
    "mm_audio_fingerprints",
    "mm_audio_fp_matches",
    "mm_y4m_frame_stats",
    "mm_y4m_scene_cuts",
    "corpus_chao1_richness",
    "pipeline_split_leakage",
    "privacy_apportioned_release",
    "events_hazard_table",
    "events_mad_anomalies",
    "events_km_curve",
    "events_cusum_changepoint",
    "events_growth_accounting",
    "eval_kendall_tau",
    "mlprep_cramers_v",
    "mlprep_feature_hashing",
    "mlprep_hashed_features",
    "mlprep_iqr_outliers",
    "eval_rbo",
    "eval_cochrans_q",
    "eval_wilcoxon",
    "eval_perm_test",
    "eval_wilson_ci",
    "olap_cube_revenue",
    # Plan-changed re-proofs (the LSH bucket cap).
    "dedup_embedding_cosine",
    "pipeline_semantic_dedup",
    # Reconfirms: the stalest green rows (all r4-stamped).
    "pyapi_group_median",
    "events_drift_excursion",
    "events_rolling_actives",
    "profile_group_quantiles",
    "events_peak_concurrency",
    "events_path_trigrams",
    "events_hourly_anomalies",
    "events_ohlc_bars",
    "events_lateness_audit",
    "events_asof_join",
    "events_bounded_funnel",
    "events_last_touch_attribution",
    "events_pattern_match",
    "profile_mad_outliers",
    "profile_trimmed_mean",
    "profile_weighted_median",
    "events_clamped_balance",
)

# Round 10: all 39 R10_PRESTAGE names (the queries added during round
# 9, first driver-checkable now) + 11 reconfirm slots.  ``rotation.py``
# 's mechanized proposal (run at round-10 start against the full
# PLAN_HASHES history, rounds 5/7/8/9 all re-recorded through the
# fixed normalizer) found ZERO plan-changed re-proof candidates at
# ROTATION TIME — the r9 snapshot matched every then-current analyzed
# plan — so the whole 11-slot re-proof budget reconfirms the stalest
# green rows: the r4-stamped events/session/funnel battery, none
# re-hashed since round 4.  (Three plans changed LATER in round 10 —
# text_strip_markup, graph_cooccurrence_pairs (md5-rank cap,
# 2df9605814af2ac7 → 117ef76da4a85850), eval_bootstrap_ci — all three
# directed fixes; all three sit in this window as prestage/re-proof
# slots, so the post-change plans were driver-proven green in the r10
# results anyway.)  This window closes cumulative driver coverage at
# 316/316 — every registered query will have a green driver row.
_R10_WINDOW: tuple[str, ...] = (
    # The 39 never-driver-checked queries (R10_PRESTAGE), in
    # registration order.
    "dedup_minhash_accuracy",
    "dedup_threshold_yield",
    "dedup_substring_spans",
    "sim_mmr_rerank",
    "sim_centroid_drift",
    "sim_norm_histogram",
    "text_strip_markup",
    "search_best_window",
    "text_readability",
    "mm_token_budget",
    "mm_aspect_bucket",
    "pipeline_split_balance",
    "corpus_token_burstiness",
    "pipeline_epoch_shuffle",
    "corpus_simpson_diversity",
    "sketch_histogram_quantiles",
    "sketch_hll_intersection",
    "sketch_ams_f2",
    "privacy_pseudonymize",
    "privacy_dp_release",
    "graph_ego_sample",
    "graph_cooccurrence_pairs",
    "graph_clustering_coefficient",
    "cdc_feed_audit",
    "events_conversion_latency",
    "events_stickiness",
    "profile_concentration",
    "events_seasonal_baseline",
    "eval_mcnemar",
    "eval_effect_size",
    "eval_bootstrap_ci",
    "mlprep_corr_matrix",
    "mlprep_loo_target_encode",
    "eval_spearman",
    "eval_krippendorff_alpha",
    "events_rfm_scores",
    "eval_token_f1",
    "layout_hilbert_key_hist",
    "olap_share_of_parent",
    # Reconfirms: the stalest green rows (all r4-stamped).
    "events_hopping_window",
    "events_session_window_native",
    "events_sessionize",
    "events_funnel_stages",
    "events_rolling_features",
    "events_resample_ffill",
    "events_cohort_retention",
    "pyapi_user_span_features",
    "events_wow_report",
    "events_markov_transitions",
    "events_time_weighted_avg",
)

# Round 9: all 16 R9_PRESTAGE names (the queries added during round 8,
# first driver-checkable now) + 34 reconfirm slots.  ``rotation.py``'s
# mechanized proposal — run against the FIXED-normalizer re-recorded
# PLAN_HASHES snapshots (rounds 5/7/8 replayed through the generalized
# lambda-counter rule; the old ``x_``-only rule produced 22 phantom
# "changed" fingerprints in the r8 diff, judge-verified) — found ZERO
# plan-changed re-proof candidates: the genuine 7→8 diff is exactly
# ``corpus_quality_rule_audit`` (the streaming-twin refactor), and the
# round-8 driver already hash-checked it GREEN on the post-refactor
# plan at round end, so it needs no slot.  The whole re-proof budget
# therefore reconfirms the stalest green rows (r3-stamped sketch/
# privacy/graph/cdc/search batteries, then the oldest r4 rows).  This
# window closes cumulative driver coverage at 277/277 — every query in
# the round-8 suite will have a green driver row.
_R9_WINDOW: tuple[str, ...] = (
    # The 16 never-driver-checked queries (R9_PRESTAGE), in
    # registration order.
    "dedup_cluster_size_histogram",
    "dedup_blocking_recall",
    "sim_cosine_histogram",
    "text_sentence_stats",
    "text_case_profile",
    "mm_patch_plan",
    "corpus_token_drift",
    "sketch_countmin_delta",
    "graph_reach_summary",
    "graph_degree_assortativity",
    "events_cumulative_distinct",
    "events_decayed_engagement",
    "eval_mcc",
    "events_position_attribution",
    "eval_ece",
    "profile_join_fanout",
    # Reconfirms: the stalest green rows (r3, then r4).
    "sketch_exact_n_sample",
    "sketch_kmv_setops",
    "sketch_hash_sample",
    "sketch_weighted_sample",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_suppressed_release",
    "graph_pagerank_trade",
    "graph_degree_histogram",
    "graph_link_prediction",
    "graph_triangle_count",
    "graph_bfs_hops",
    "cdc_merge_upsert",
    "cdc_time_travel",
    "cdc_incremental_join",
    "cdc_incremental_rollup",
    "cdc_scd2_history",
    "cdc_snapshot_diff",
    "pipeline_pack_sequences",
    "search_bm25_topk",
    "search_phrase",
    "search_fuzzy_join_blocked",
    "profile_documents",
    "profile_histogram_nchars",
    "profile_ols_slope",
    "profile_correlation",
    "pyapi_arrow_byte_stats",
    "profile_length_drift_chi2",
    "pyapi_scalar_iter_stats",
    "pyapi_chunk_udtf",
    "events_windowed_agg",
    "events_activity_streaks",
    "events_interarrival_histogram",
    "pyapi_arrow_group_stats",
)

# Round 6: all 16 R6_PRESTAGE names (the queries added during round 5,
# first driver-checkable now) + 34 reconfirm slots.  ``rotation.py``'s
# mechanized proposal found ZERO plan-changed re-proof candidates (the
# round-5 PLAN_HASHES snapshot matches every current analyzed plan), so
# per VERDICT r5 directive 1 the re-proof budget goes to priority (b):
# the 34 STALEST still-r1-stamped green rows — the TPC-H 22, the OLAP
# window/rollup battery, and the window/sql_api singletons, none
# re-hashed since round 1.  This window re-closes cumulative driver
# coverage at 249/249.
_R6_WINDOW: tuple[str, ...] = (
    # The 16 round-5 additions (R6_PRESTAGE), never driver-checked.
    "dedup_containment_pairs",
    "cdc_incremental_dedup",
    "sim_bitext_mining",
    "text_char_gini",
    "text_tokenizer_fertility",
    "pipeline_dataset_card",
    "corpus_repeated_chunks",
    "corpus_bigram_lm_score",
    "pipeline_temperature_mixture",
    "sketch_hll_distinct",
    "privacy_t_closeness",
    "graph_resource_allocation",
    "mlprep_winsorize",
    "eval_brier_decomposition",
    "eval_average_precision",
    "eval_mrr",
    # Reconfirms: green since round 1, never re-hashed (stalest rows).
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_lateness_classes",
    "tpch_q13_order_counts",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_idle_customers",
    "window_topk_per_group",
    "window_running_total",
    "olap_pivot_event_matrix",
    "olap_melt_lineitem_metrics",
    "olap_rollup_region_nation",
    "olap_cube_region_segment",
    "olap_grouping_sets",
    "olap_ntile_deciles",
    "olap_window_battery",
    "sql_api_supplier_revenue",
    "olap_setops_customer_activity",
    "olap_distinct_agg",
)

# Round 5: 9 re-proofs + all 41 R5_PRESTAGE names — this window closes
# driver coverage at 233/233 (every query in the round-4 suite will
# have a driver row, and every latest row was green going in).
#
# The re-proofs are r2-green queries whose PHYSICAL PLANS changed
# since their last driver hash:
#   * the five geo queries that flow through dissolve/erase/overlay —
#     r4 made dissolve's skew-salting automatic (geo/ops.py:257
#     ``_auto_n_salt`` probe), so the dissolve users' plans now carry
#     the pre-count; the erase/overlay/sliver plans absorbed the r3/r4
#     kernel repairs (pinched-ring split, even-odd identity keep);
#   * the two heaviest long-unchecked r2 rows (``dedup_minhash_lsh_pairs``
#     banding/no-BNLJ sweep, ``sim_lsh_ann_topk``);
#   * ``sim_ivf_index_persisted`` — r5 splits the harness into
#     build-once/probe-only and drops the collect(), changing the
#     benched plan (VERDICT r4 item 4);
#   * ``dedup_connected_components`` / ``pipeline_semantic_dedup`` —
#     r5 added the pointer-jumping step to connected_components
#     (plans rewritten mid-round, AFTER the first PLAN_HASHES
#     snapshot, so the fingerprint mechanism can't flag them — they
#     take the slots originally penciled for stale-green reconfirms
#     (dedup_exact, sim_lsh_ann_topk): plan-changed beats stale).
_R5_WINDOW: tuple[str, ...] = (
    # Re-proofs (r2-green, plans since rewritten).
    "ref_a1_dissolve_attach",
    "geo_a1_dissolve",
    "geo_j2_union_overlay",
    "geo_j3_erase",
    "geo_sliver_fix",
    "dedup_minhash_lsh_pairs",
    "dedup_connected_components",
    "sim_ivf_index_persisted",
    "pipeline_semantic_dedup",
    # The full 41-entry never-checked remainder after round 4
    # (R5_PRESTAGE), in its pinned order.
    "text_url_canonicalize",
    "olap_keyset_page",
    "text_fingerprint",
    "pipeline_training_data",
    "text_zscore_nchars",
    "text_rarity_score",
    "eval_lang_id_confusion",
    "func_array_set_battery",
    "mlprep_hash_features",
    "mlprep_one_hot_segments",
    "pipeline_shard_assign",
    "pipeline_mixture_resample",
    "pipeline_mixture_upsample",
    "olap_bitmap_distinct",
    "text_redact_pii",
    "pipeline_blocklist_filter",
    "eval_ab_uplift",
    "eval_exact_auc",
    "eval_confusion_sweep",
    "mlprep_quantile_align",
    "events_range_join",
    "events_gap_detection",
    "events_interval_union",
    "pipeline_quota_sample",
    "search_tfidf_topk",
    "search_conjunctive",
    "search_proximity",
    "search_fuzzy_name_lookup",
    "layout_zorder_key_hist",
    "func_map_roundtrip",
    "dedup_cluster_keeper",
    "pipeline_dedup_yield",
    "corpus_vocab_coverage",
    "mlprep_curriculum_phases",
    "mlprep_target_encode",
    "eval_calibration_bins",
    "mlprep_kfold_stratified",
    "graph_kcore_trade",
    "privacy_randomized_response",
    "sim_pq_rerank_topk",
    "graph_label_propagation",
)

# Round 4: 3 re-proofs + 47 first-ever driver rows.
#
# The re-proofs are the three r1-green queries whose physical plans
# were REWRITTEN in r3 from single-partition global windows to
# two-phase range-bucketed forms (operators/scale.py ranged_rank /
# ranged_cumsum / ranged_gaps); the driver has never hashed the new
# plans (VERDICT r3 item 5).  The 47 new rows are all remaining
# profile_* (10), pyapi_* (6), 26 of the 29 remaining events_*, and
# the 5 scalar-function batteries — leaving exactly R5_PRESTAGE (41
# entries: 30 pre-existing + the 11 queries added during round 4)
# never-checked for the round-5 rotation.
_R4_WINDOW: tuple[str, ...] = (
    # Re-proofs: r3-rewritten two-phase plans (green in r1 on the old
    # single-window plans).
    "gate_sequence_gaps",
    "olap_top_movers",
    "olap_pareto_abc",
    # Never-checked, in canonical registration order.
    "profile_documents",
    "profile_histogram_nchars",
    "profile_ols_slope",
    "profile_correlation",
    "pyapi_arrow_byte_stats",
    "profile_length_drift_chi2",
    "pyapi_scalar_iter_stats",
    "pyapi_chunk_udtf",
    "events_windowed_agg",
    "events_activity_streaks",
    "events_interarrival_histogram",
    "pyapi_arrow_group_stats",
    "events_hopping_window",
    "events_session_window_native",
    "events_sessionize",
    "events_funnel_stages",
    "events_rolling_features",
    "events_resample_ffill",
    "events_cohort_retention",
    "pyapi_user_span_features",
    "events_wow_report",
    "events_markov_transitions",
    "events_time_weighted_avg",
    "pyapi_group_median",
    "events_drift_excursion",
    "events_rolling_actives",
    "profile_group_quantiles",
    "events_peak_concurrency",
    "events_path_trigrams",
    "events_hourly_anomalies",
    "events_ohlc_bars",
    "events_lateness_audit",
    "events_asof_join",
    "events_bounded_funnel",
    "events_last_touch_attribution",
    "events_km_survival",
    "events_pattern_match",
    "profile_mad_outliers",
    "profile_trimmed_mean",
    "profile_weighted_median",
    "events_clamped_balance",
    "profile_gini_impurity",
    "func_date_battery",
    "func_string_battery",
    "func_null_battery",
    "func_bitwise_battery",
    "func_try_battery",
)

# Round 3 window, kept for the audit trail (the contract test checks
# each historical window against the CORRECTNESS files that predate
# it).
_R3_WINDOW: tuple[str, ...] = (
    "ref_f10_nullif_empty",
    "ref_a3_missing_gate",
    "func_vector_ops",
    "sim_kmeans_refine",
    "mm_binary_features",
    "mm_image_decode_stats",
    "mm_image_resize_stats",
    "mm_frame_sample",
    "mm_audio_decode_stats",
    "mm_audio_windows",
    "mm_shot_boundaries",
    "corpus_source_report",
    "corpus_chunk_documents",
    "corpus_ngram_precision_eval",
    "corpus_simhash_near_pairs",
    "corpus_bpe_encode",
    "corpus_dsir_weights",
    "corpus_span_corruption",
    "corpus_pmi_pairs",
    "corpus_pair_merges",
    "corpus_ngram_topk",
    "corpus_length_band_filter",
    "corpus_repetition_stats",
    "sketch_countmin_heavy_hitters",
    "sketch_kmv_distinct",
    "sketch_kmv_setops",
    "sketch_exact_n_sample",
    "sketch_hash_sample",
    "sketch_weighted_sample",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_suppressed_release",
    "graph_degree_histogram",
    "graph_triangle_count",
    "graph_pagerank_trade",
    "graph_bfs_hops",
    "graph_link_prediction",
    "graph_modularity_nations",
    "cdc_merge_upsert",
    "cdc_scd2_history",
    "cdc_snapshot_diff",
    "cdc_time_travel",
    "cdc_incremental_join",
    "cdc_incremental_rollup",
    "pipeline_decontaminate",
    "pipeline_train_val_test",
    "pipeline_pack_sequences",
    "search_bm25_topk",
    "search_phrase",
    "search_fuzzy_join_blocked",
)

# Round 7: the 4 never-checked queries (3 added during round 6 +
# ``eval_ndcg_at_k``, whose operator landed in r6 but was only
# registered at the start of r7) + 26 evidence-driven re-proofs + 20
# stalest reconfirms.  Round 6 never ran ``rotation --snapshot``, so
# the re-proof proposal compares against the ROUND-5 fingerprints:
# every plan the r6 hardening/bitext/streaming work touched proposes
# itself.  The seven r6-GREEN rows in that set (cdc_incremental_dedup
# … eval_brier_decomposition) were driver-checked AFTER the hardening
# landed, so re-proving them is belt-and-braces per VERDICT r6
# directive 1 ("prioritize every query whose plan absorbed the r6
# hardening"); the r2/r3-green similarity/func rows are genuine
# never-rehashed plan changes.  This window closes cumulative driver
# coverage at 253/253.
_R7_WINDOW: tuple[str, ...] = (
    # Never driver-checked (R7_PRESTAGE).
    "sim_bitext_mining_lsh",
    "text_hapax_stats",
    "text_ttr_curve",
    "eval_ndcg_at_k",
    # Re-proofs: plans changed since the round-5 fingerprint snapshot
    # (r6 hardening batch — driver-green in r6 on the current plans).
    "cdc_incremental_dedup",
    "sim_bitext_mining",
    "text_tokenizer_fertility",
    "pipeline_temperature_mixture",
    "privacy_t_closeness",
    "mlprep_winsorize",
    "eval_brier_decomposition",
    # Re-proofs: r2/r3/r4/r5-green rows whose plans changed since
    # their last driver hash (similarity shared-helper rewrites, the
    # PQ probe-batch cap, BPE/vector/func plumbing).
    "dedup_embedding_cosine",
    "pipeline_incremental_dedup",
    "sim_centroid_outliers",
    "sim_bruteforce_cosine_topk",
    "sim_lsh_ann_topk",
    "sim_ivf_ann_topk",
    "sim_pq_adc_topk",
    "sim_pq_rerank_topk",
    "sim_kmeans_refine",
    "func_vector_ops",
    "sim_ann_recall",
    "sim_matryoshka_recall",
    "pipeline_hard_negatives",
    "sim_cluster_purity",
    "sim_ivf_index_persisted",
    "corpus_bpe_encode",
    "graph_modularity_nations",
    "events_km_survival",
    "func_map_roundtrip",
    # Reconfirms: the stalest remaining r1/r2-green rows.
    "olap_percentiles",
    "func_json_props",
    "func_variant_props",
    "olap_basket_affinity",
    "gate_fk_orphans",
    "profile_skew_report",
    "scale_bloom_prefilter_join",
    "scale_salted_join",
    "gate_benford_audit",
    "scale_bloom_fpr",
    "gate_pk_audit",
    "olap_share_of_wallet",
    "ref_p1_filter_compound",
    "ref_f_scalar_surface",
    "ref_f3_value_map",
    "ref_j1_join_field_first_match",
    "ref_u1_merge_by_name",
    "ref_f8_fix_individual",
    "ref_a2_count_gate",
    "ref_pipeline_flagship",
)

# Round 8: the 8 R8_PRESTAGE names (5 round-7 additions + the 3
# round-7 dead-code rescues registered at round-8 start) + 42
# reconfirm slots.  ``rotation.py``'s mechanized proposal — run
# against the round-7 fingerprint snapshot recorded at round-8 start
# (the working tree's plans ARE the plans the r7 driver hash-checked:
# no plan-affecting commit landed after the r7 end-of-round snapshot)
# — found ZERO plan-changed re-proof candidates, so the whole
# re-proof budget goes to the stalest green rows (r2/r3-stamped geo
# grid, multimodal, corpus and sketch batteries).  This window closes
# cumulative driver coverage at 261/261.
_R8_WINDOW: tuple[str, ...] = (
    # The 8 never-driver-checked queries (R8_PRESTAGE).
    "text_charclass_profile",
    "profile_source_diversity",
    "corpus_quality_rule_audit",
    "corpus_vocab_overlap",
    "sketch_hll_merge_rollup",
    "privacy_generalization_ladder",
    "eval_cohens_kappa",
    "eval_fleiss_kappa",
    # Reconfirms: the stalest green rows (r2, then r3).
    "geo_grid_refine_density",
    "geo_knn_join_grid",
    "geo_cell_coverage",
    "geo_knn_assign",
    "geo_g3_area_crs",
    "geo_rotated_ops",
    "dedup_exact",
    "corpus_source_keywords",
    "corpus_novelty_scores",
    "corpus_source_similarity",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_prefix_jaccard_join",
    "pipeline_quality_keeper",
    "sim_quantize_report",
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "ref_f10_nullif_empty",
    "ref_a3_missing_gate",
    "corpus_source_report",
    "mm_binary_features",
    "mm_frame_sample",
    "mm_audio_windows",
    "mm_shot_boundaries",
    "mm_image_decode_stats",
    "mm_image_resize_stats",
    "mm_audio_decode_stats",
    "corpus_chunk_documents",
    "corpus_ngram_precision_eval",
    "corpus_simhash_near_pairs",
    "corpus_dsir_weights",
    "corpus_span_corruption",
    "corpus_pmi_pairs",
    "corpus_pair_merges",
    "corpus_ngram_topk",
    "corpus_length_band_filter",
    "corpus_repetition_stats",
    "pipeline_train_val_test",
    "pipeline_decontaminate",
    "sketch_countmin_heavy_hitters",
    "sketch_kmv_distinct",
)

WINDOWS: dict[int, tuple[str, ...]] = {
    3: _R3_WINDOW,
    4: _R4_WINDOW,
    5: _R5_WINDOW,
    6: _R6_WINDOW,
    7: _R7_WINDOW,
    8: _R8_WINDOW,
    9: _R9_WINDOW,
    10: _R10_WINDOW,
    11: _R11_WINDOW,
    12: _R12_WINDOW,
}

REPROOFS: dict[int, frozenset[str]] = {
    # r2 red rows (oracle-typing / output-shape fixes proven in r3).
    3: frozenset({
        "ref_f10_nullif_empty",
        "ref_a3_missing_gate",
        "func_vector_ops",
        "sim_kmeans_refine",
    }),
    # r3-rewritten two-phase plans, driver-green only on the old plans.
    4: frozenset({
        "gate_sequence_gaps",
        "olap_top_movers",
        "olap_pareto_abc",
    }),
    # r2-green queries whose plans changed since (dissolve auto-salt,
    # kernel repairs, IVF build/probe split, CC pointer-jumping) + the
    # heaviest old green (minhash banding sweep).
    5: frozenset({
        "ref_a1_dissolve_attach",
        "geo_a1_dissolve",
        "geo_j2_union_overlay",
        "geo_j3_erase",
        "geo_sliver_fix",
        "dedup_minhash_lsh_pairs",
        "dedup_connected_components",
        "sim_ivf_index_persisted",
        "pipeline_semantic_dedup",
    }),
    # Round 6: zero plan-changed candidates (r5 PLAN_HASHES snapshot ==
    # current plans), so the whole 34-slot budget reconfirms the
    # stalest r1-green rows.
    6: frozenset({
        "tpch_q1_pricing_summary",
        "tpch_q2_min_cost_supplier",
        "tpch_q3_shipping_priority",
        "tpch_q4_order_priority",
        "tpch_q5_local_supplier_volume",
        "tpch_q6_revenue_forecast",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
        "tpch_q10_returned_items",
        "tpch_q11_important_stock",
        "tpch_q12_lateness_classes",
        "tpch_q13_order_counts",
        "tpch_q14_promo_effect",
        "tpch_q15_top_supplier",
        "tpch_q16_supplier_counts",
        "tpch_q17_small_qty_revenue",
        "tpch_q18_large_orders",
        "tpch_q19_disjunctive",
        "tpch_q20_excess_suppliers",
        "tpch_q21_waiting_suppliers",
        "tpch_q22_idle_customers",
        "window_topk_per_group",
        "window_running_total",
        "olap_pivot_event_matrix",
        "olap_melt_lineitem_metrics",
        "olap_rollup_region_nation",
        "olap_cube_region_segment",
        "olap_grouping_sets",
        "olap_ntile_deciles",
        "olap_window_battery",
        "sql_api_supplier_revenue",
        "olap_setops_customer_activity",
        "olap_distinct_agg",
    }),
    # Round 7: everything in the window except the 4 never-checked
    # queries already has a driver row (26 plan-changed re-proofs +
    # 20 stalest reconfirms — see the _R7_WINDOW comment).
    7: frozenset(
        n for n in (
            "cdc_incremental_dedup",
            "sim_bitext_mining",
            "text_tokenizer_fertility",
            "pipeline_temperature_mixture",
            "privacy_t_closeness",
            "mlprep_winsorize",
            "eval_brier_decomposition",
            "dedup_embedding_cosine",
            "pipeline_incremental_dedup",
            "sim_centroid_outliers",
            "sim_bruteforce_cosine_topk",
            "sim_lsh_ann_topk",
            "sim_ivf_ann_topk",
            "sim_pq_adc_topk",
            "sim_pq_rerank_topk",
            "sim_kmeans_refine",
            "func_vector_ops",
            "sim_ann_recall",
            "sim_matryoshka_recall",
            "pipeline_hard_negatives",
            "sim_cluster_purity",
            "sim_ivf_index_persisted",
            "corpus_bpe_encode",
            "graph_modularity_nations",
            "events_km_survival",
            "func_map_roundtrip",
            "olap_percentiles",
            "func_json_props",
            "func_variant_props",
            "olap_basket_affinity",
            "gate_fk_orphans",
            "profile_skew_report",
            "scale_bloom_prefilter_join",
            "scale_salted_join",
            "gate_benford_audit",
            "scale_bloom_fpr",
            "gate_pk_audit",
            "olap_share_of_wallet",
            "ref_p1_filter_compound",
            "ref_f_scalar_surface",
            "ref_f3_value_map",
            "ref_j1_join_field_first_match",
            "ref_u1_merge_by_name",
            "ref_f8_fix_individual",
            "ref_a2_count_gate",
            "ref_pipeline_flagship",
        )
    ),
    # Round 8: zero plan-changed candidates against the round-7
    # fingerprint snapshot (recorded at round-8 start from the
    # unchanged end-of-r7 tree), so the 42 non-new slots all
    # reconfirm the stalest r2/r3-green rows.
    8: frozenset(_R8_WINDOW[8:]),
    # Round 9: zero plan-changed candidates against the FIXED-normalizer
    # re-recorded snapshots (the only genuine 7→8 plan change,
    # corpus_quality_rule_audit, was driver-checked green on its new
    # plan at round-8 end), so the 34 non-new slots all reconfirm the
    # stalest r3/r4-green rows.
    9: frozenset(_R9_WINDOW[16:]),
    # Round 10: zero plan-changed candidates (the r9 PLAN_HASHES
    # snapshot matches every current analyzed plan), so the 11 non-new
    # slots all reconfirm the stalest r4-green rows (the events/
    # session/funnel battery).
    10: frozenset(_R10_WINDOW[39:]),
    # Round 11: 2 plan-change re-proofs (LSH bucket cap) + 17 stale
    # reconfirms = every window entry that already had a driver row.
    11: frozenset(_R11_WINDOW[31:]),
    12: frozenset(_R12_WINDOW[14:]),
}

# The 41 queries that were still driver-unchecked after round 4
# (30 pre-existing + the 11 QuerySpecs added during round 4) — all of
# them are in WINDOWS[5], which closes driver coverage for the
# round-4 suite at 233/233.
R5_PRESTAGE: tuple[str, ...] = (
    "text_url_canonicalize",
    "olap_keyset_page",
    "text_fingerprint",
    "pipeline_training_data",
    "text_zscore_nchars",
    "text_rarity_score",
    "eval_lang_id_confusion",
    "func_array_set_battery",
    "mlprep_hash_features",
    "mlprep_one_hot_segments",
    "pipeline_shard_assign",
    "pipeline_mixture_resample",
    "pipeline_mixture_upsample",
    "olap_bitmap_distinct",
    "text_redact_pii",
    "pipeline_blocklist_filter",
    "eval_ab_uplift",
    "eval_exact_auc",
    "eval_confusion_sweep",
    "mlprep_quantile_align",
    "events_range_join",
    "events_gap_detection",
    "events_interval_union",
    "pipeline_quota_sample",
    "search_tfidf_topk",
    "search_conjunctive",
    "search_proximity",
    "search_fuzzy_name_lookup",
    "layout_zorder_key_hist",
    "func_map_roundtrip",
    # r4 additions (implemented after the r4 window was pinned, so
    # their first driver check is round 5 by construction).
    "dedup_cluster_keeper",
    "pipeline_dedup_yield",
    "corpus_vocab_coverage",
    "mlprep_curriculum_phases",
    "mlprep_target_encode",
    "eval_calibration_bins",
    "mlprep_kfold_stratified",
    "graph_kcore_trade",
    "privacy_randomized_response",
    "sim_pq_rerank_topk",
    "graph_label_propagation",
)

# Queries ADDED during round 5 (after WINDOWS[5] was pinned): their
# first possible driver check is round 6.  Every new QuerySpec must be
# appended here — ``tests/test_contract_shapes.py`` asserts that the
# suite minus prior coverage minus WINDOWS[5] equals exactly this set.
R6_PRESTAGE: tuple[str, ...] = (
    "sketch_hll_distinct",
    "pipeline_temperature_mixture",
    "mlprep_winsorize",
    "eval_brier_decomposition",
    "graph_resource_allocation",
    "dedup_containment_pairs",
    "cdc_incremental_dedup",
    "text_char_gini",
    "corpus_bigram_lm_score",
    "corpus_repeated_chunks",
    "eval_average_precision",
    "eval_mrr",
    "text_tokenizer_fertility",
    "sim_bitext_mining",
    "privacy_t_closeness",
    "pipeline_dataset_card",
)

# Queries ADDED during round 6 (after WINDOWS[6] was pinned): their
# first possible driver check is round 7.  Every new QuerySpec must be
# appended here — the contract test derives the invariant.
R7_PRESTAGE: tuple[str, ...] = (
    "sim_bitext_mining_lsh",
    "text_hapax_stats",
    "text_ttr_curve",
    # Operator implemented during round 6 (operators/mlprep.py) but
    # only REGISTERED as a QuerySpec at the start of round 7 — its
    # first possible driver check is round 7, same as the rest.
    "eval_ndcg_at_k",
)

# Queries ADDED during round 7 (after WINDOWS[7] was pinned): their
# first possible driver check is round 8.  Every new QuerySpec must be
# appended here — the contract test derives the invariant.
R8_PRESTAGE: tuple[str, ...] = (
    "text_charclass_profile",
    "profile_source_diversity",
    "corpus_quality_rule_audit",
    "corpus_vocab_overlap",
    "eval_cohens_kappa",
    # Operators implemented during round 7 but only REGISTERED as
    # QuerySpecs at the start of round 8 (VERDICT r7 directive 2 —
    # the dead-code rescue, same path eval_ndcg_at_k took): their
    # first possible driver check is round 8, same as the rest.
    "sketch_hll_merge_rollup",
    "privacy_generalization_ladder",
    "eval_fleiss_kappa",
)

# Queries ADDED during round 8 (after WINDOWS[8] was pinned): their
# first possible driver check is round 9.  Every new QuerySpec must be
# appended here — the contract test derives the invariant.
R9_PRESTAGE: tuple[str, ...] = (
    "sketch_countmin_delta",
    "dedup_cluster_size_histogram",
    "corpus_token_drift",
    "eval_mcc",
    "dedup_blocking_recall",
    "graph_reach_summary",
    "events_cumulative_distinct",
    "events_decayed_engagement",
    "mm_patch_plan",
    "text_sentence_stats",
    "sim_cosine_histogram",
    "profile_join_fanout",
    "events_position_attribution",
    "graph_degree_assortativity",
    "eval_ece",
    "text_case_profile",
)

# Queries ADDED during round 9 (after WINDOWS[9] was pinned): their
# first possible driver check is round 10.  Every new QuerySpec must be
# appended here — the contract test derives the invariant.
R10_PRESTAGE: tuple[str, ...] = (
    "dedup_substring_spans",
    "graph_clustering_coefficient",
    "eval_krippendorff_alpha",
    "events_rfm_scores",
    "text_readability",
    "pipeline_epoch_shuffle",
    "mm_aspect_bucket",
    "eval_token_f1",
    "sim_centroid_drift",
    "corpus_simpson_diversity",
    "sketch_hll_intersection",
    "sim_norm_histogram",
    # Round-9 second wave (this session's additions), in commit order.
    "sketch_ams_f2",
    "privacy_dp_release",
    "mlprep_corr_matrix",
    "mlprep_loo_target_encode",
    "eval_spearman",
    "corpus_token_burstiness",
    "events_seasonal_baseline",
    "graph_cooccurrence_pairs",
    "mm_token_budget",
    "olap_share_of_parent",
    "profile_concentration",
    "dedup_threshold_yield",
    "sim_mmr_rerank",
    "sketch_histogram_quantiles",
    "dedup_minhash_accuracy",
    "events_stickiness",
    "eval_bootstrap_ci",
    "eval_mcnemar",
    "eval_effect_size",
    "graph_ego_sample",
    "privacy_pseudonymize",
    "search_best_window",
    "layout_hilbert_key_hist",
    "events_conversion_latency",
    "cdc_feed_audit",
    "text_strip_markup",
    "pipeline_split_balance",
)

# Queries ADDED during round 10 (after WINDOWS[10] was pinned): their
# first possible driver check is round 11.  Every new QuerySpec must
# be appended here — the contract test derives the invariant.
R11_PRESTAGE: tuple[str, ...] = (
    "dedup_winnowing",
    "eval_kendall_tau",
    "mlprep_cramers_v",
    "mlprep_feature_hashing",
    "mlprep_hashed_features",
    "events_hazard_table",
    "events_mad_anomalies",
    "mm_image_dhash",
    "mm_dhash_near_pairs",
    # Second wave (same session).
    "events_growth_accounting",
    "mlprep_iqr_outliers",
    "olap_cube_revenue",
    "mm_audio_fingerprints",
    "mm_audio_fp_matches",
    "text_sentence_dedup",
    "text_loop_detection",
    "eval_rbo",
    "privacy_apportioned_release",
)

# The 13 round-11 additions that landed BEFORE the round-11 rotation
# ran: they sit directly in WINDOWS[11] (driver rows this round, no
# prestage cycle), but the historical suite-reconstruction in
# tests/test_contract_shapes.py still needs to know they post-date
# round 4 — in-window additions are recorded here for that purpose.
R11_INWINDOW_ADDITIONS: tuple[str, ...] = (
    "events_km_curve",
    "events_cusum_changepoint",
    "eval_cochrans_q",
    "eval_wilcoxon",
    "eval_perm_test",
    "eval_wilson_ci",
    "text_script_profile",
    "text_ngram_novelty",
    "corpus_chao1_richness",
    "pipeline_split_leakage",
    "mm_y4m_frame_stats",
    "mm_y4m_scene_cuts",
    "sim_lsh_recall_audit",
)

# Queries ADDED during round 11 AFTER WINDOWS[11] was pinned: their
# first possible driver check is round 12.  Only later-session
# additions accumulate here (the 13 pre-rotation additions are in
# R11_INWINDOW_ADDITIONS and WINDOWS[11] instead).
R12_PRESTAGE: tuple[str, ...] = (
    "events_trend_test",
    "eval_lift_table",
    "corpus_heaps_curve",
    "text_mixed_script",
    "events_seasonal_naive",
    "eval_ks_test",
    "mlprep_smd_balance",
    "eval_bradley_terry",
    # corpus_tokenizer_fertility was prestaged here in round 11 and
    # RETIRED in round 12 before ever taking a driver row (round-11
    # verdict "What's wrong" #2: it near-duplicated the round-5
    # text_tokenizer_fertility spec).  Its one extra column moved into
    # the surviving textstats operator, whose spec re-proves this
    # round (schema + plan change).
)

# The 6 round-12 additions that landed BEFORE the round-12 rotation
# ran: they sit directly in WINDOWS[12] (driver rows this round, no
# prestage cycle), recorded here so the historical suite
# reconstruction in tests/test_contract_shapes.py knows they
# post-date round 4 (the R11_INWINDOW_ADDITIONS precedent).
R12_INWINDOW_ADDITIONS: tuple[str, ...] = (
    "eval_mann_whitney",
    "eval_weighted_kappa",
    "events_pettitt_changepoint",
    "events_runs_test",
    "corpus_tv_distance",
    "text_encoding_anomaly",
)

# Queries ADDED during round 12 AFTER WINDOWS[12] was pinned: their
# first possible driver check is round 13.
R13_PRESTAGE: tuple[str, ...] = (
    "eval_did",
    "eval_bh_fdr",
    "eval_mh_odds",
    "eval_cuped",
    "mlprep_icc_deff",
    "eval_conformal",
    "eval_qte",
)

PRESTAGE: dict[int, tuple[str, ...]] = {
    5: R5_PRESTAGE,
    6: R6_PRESTAGE,
    7: R7_PRESTAGE,
    8: R8_PRESTAGE,
    9: R9_PRESTAGE,
    10: R10_PRESTAGE,
    11: R11_PRESTAGE,
    12: R12_PRESTAGE,
    13: R13_PRESTAGE,
}

CURRENT_WINDOW: tuple[str, ...] = WINDOWS[CURRENT_ROUND]
