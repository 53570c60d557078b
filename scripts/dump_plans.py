#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the flagship queries,
with the scale-relevant properties called out. Run from the repo root."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as m  # noqa: E402
from iowa_liquor_sales_spark import get_spark  # noqa: E402

FLAGSHIP = [
    "q_groupby_agg",
    "q_star_join",
    "q_shipping_priority",
    "q_minhash_lsh",
    "q_ann_bruteforce",
    "q_events_window",
    "q_winnow_fingerprint",
    "q_tfidf",
    "q_resample_ffill",
    "q_pack_sequences",
    "q_bloom_prefilter",
    "q_regional_revenue",
    "q_window_distinct",
    "q_corpus_yield",
    "q_chunk_documents",
    "q_hll",
    "q_zorder",
    # round-2 additions / reworked scale paths
    "q_ngram_jaccard",
    "q_embed_neardup",
    "q_semdedup",
    "q_quality_weights",
    "q_source_cap",
    "q_global_rank",
    "q_ann_sq8",
    "q_skyline",
    "q_bucketed_join",
    "q_cross_corpus",
    "q_session_native",
    "q_pmi_bigrams",
    "q_cdc_apply",
    "q_ewma",
    "q_bm25",
    "q_simhash_pairs",
    "q_sorted_neighborhood",
    "q_kcore",
    "q_hll_overlap",
    "q_rfm_segments",
    "q_attribution",
    "q_join_cardinality",
    "q_bitmap_distinct",
    "q_grid_density",
    "q_mmr_rerank",
    "q_revenue_spread",
    "q_lateral_topk",
    # round-3 additions
    "q_theta_diff",
    "q_interval_merge",
    "q_naive_bayes",
    "q_order_priority",
    "q_customer_distribution",
    "q_multimodal_ppm",
    "q_interval_join",
    "q_sparse_cosine",
    "q_mst_boruvka",
    "q_label_propagation",
    "q_lm_score",
    "q_winsorize",
    "q_substring_dedup",
    "q_adamic_adar",
    "q_acf",
    "q_geohash",
    "q_interp_linear",
    "q_theilsen",
    "q_zonemap_prune",
    "q_bootstrap_ci",
    "q_incremental_agg",
    "q_hll_sliding",
    "q_quantile_normalize",
    "q_embed_covariance",
    "q_kfold_loo",
    "q_k_anonymity",
    "q_pca_pc1",
    "q_term_kl_drift",
    "q_lttb_downsample",
    "q_event_motif",
    "q_clustering_coeff",
    "q_asof_nearest",
    # round-4 additions
    "q_decile_grid",
    "q_gopher_quality",
    "q_embed_decontaminate",
    "q_geo_radius_join",
    "q_dsir_weights",
    "q_conversion_funnel",
    "q_retention_cohorts",
    "q_mst_distributed",
    "q_hits",
    "q_cdc_chunks",
    "q_vocab_growth",
    "q_repetition_stats",
    "q_burst_detect",
    "q_fuzzy_names",
    "q_bucket_diff",
    "q_dp_histogram",
    "q_scene_changes",
    "q_twap",
    "q_sssp",
    "q_weighted_sample",
    "q_weighted_topk_sample",
    "q_kcenter",
    # round-5 additions
    "q_stream_attribution",
    "q_cdc_microbatch",
    "q_personalized_pagerank",
    "q_ann_pq",
    "q_ann_ivf_pq",
    "q_recursive_cte",
    "q_hard_negatives",
    "q_ann_recall_report",
    # round-6 additions
    "q_ann_multiprobe",
    "q_entity_resolution",
    "q_textrank",
    "q_auc",
    "q_audio_segments",
    "q_coreness",
    "q_minhash_calibration",
    "q_assoc_rules",
    "q_reliability",
    "q_pr_curve",
    "q_cuped",
    # round-7 additions
    "q_ann_range",
    "q_image_dhash",
    "q_bh_fdr",
    "q_leakage_split",
    "q_token_budget",
    "q_canonical_dedup",
    "q_join_delta",
    # round-8 flagships: ANN index lifecycle + the new stats operators
    # (q_token_budget is already above; its boundary stage is de-skewed
    # this round, so the regenerated dump shows the new plan)
    "q_ann_prebuilt",
    "q_ann_assign_delta",
    "q_zipf_slope",
    "q_ngram_novelty",
    "q_spearman_global",
    # round-8 second batch
    "q_mann_whitney",
    "q_ks_drift",
    "q_chi2_source_lang",
    "q_gini_chars",
    "q_dup_rate_curve",
    "q_interleave_order",
    "q_kruskal_wallis",
    "q_silhouette",
    "q_readability",
    "q_rake_keywords",
    "q_jsd_drift",
    "q_friedman",
    "q_ndcg",
    "q_dbscan_grid",
    "q_t_closeness",
    "q_harmonic_centrality",
    "q_assortativity",
    "q_modularity",
    "q_cohens_kappa",
    "q_mcc",
    "q_theil_u",
    "q_drawdown",
    "q_decayed_topk",
    "q_cronbach",
    "q_dedup_cascade",
    "q_sax_words",
    "q_lift_table",
    "q_ece",
    "q_oov_rate",
    "q_moments",
    "q_mantel_haenszel",
    "q_ljung_box",
    "q_lorenz",
    "q_logrank",
    "q_by_fdr",
    "q_lsh_plan",
    # round-8 sixth batch: statistics/encoding wave
    "q_kendall_tau",
    "q_wasserstein",
    "q_effect_sizes",
    "q_cochran_armitage",
    "q_mcnemar",
    "q_durbin_watson",
    "q_target_encode",
    "q_randomization_test",
    "q_dp_mean",
    "q_neighbor_jaccard",
    "q_map_mrr",
    "q_holm",
    "q_audio_zcr",
    "q_hurst",
    "q_isotonic",
    "q_quadratic_fit",
    "q_auc_delong",
    "q_stratified_kfold",
    "q_rolling_quantile",
    "q_script_profile",
    "q_diff_in_diff",
    "q_ngram_coverage",
    "q_hill_tail",
    "q_ams_f2",
    "q_ktruss",
    "q_preference_pairs",
    "q_truncated_recall",
    "q_sprt",
    "q_forecast_backtest",
    "q_best_f1",
    "q_betweenness",
    "q_negative_sampling",
    "q_log_odds",
    "q_rolling_anomaly",
    "q_conformal",
    "q_ucb_ranking",
    "q_knee_point",
    "q_mde_power",
    "q_two_prop_z",
    "q_gini_split",
    "q_relative_risk",
    # round-9 additions
    "q_ppm_zlib_decode",
    "q_compression_ratio",
    # round-10 additions
    "q_paragraph_neardup",
    "q_match_length_histogram",
    "q_contamination_matrix",
]

HEADER = """# PLANS — physical plans of the flagship queries

Generated by `scripts/dump_plans.py` (sf0.01, `local[8]`, AQE on).
What to look for, per the 100 TB design goals:

- `PushedFilters` / pruned `ReadSchema` on every FileScan — predicates and
  projection reach the parquet reader.
- `BroadcastHashJoin` on every fact⋈dim edge — no fact-side shuffle.
- `HashAggregate` pairs (partial → final) around a single `Exchange` —
  map-side combine bounds shuffle volume by group cardinality.
- No `SortMergeJoin`/`CartesianProduct` in any hot path; top-k appears as
  window-over-single-shuffle or `TakeOrderedAndProject`.
"""


def summarize(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"Exchange (hash|range|single)", plan)),
        "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
        "SortMergeJoin": plan.count("SortMergeJoin"),
        "HashAggregate": plan.count("HashAggregate"),
    }
    return ", ".join(f"{k}={v}" for k, v in counts.items())


def main() -> None:
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = [HEADER]
    for name in FLAGSHIP:
        df = m.queries()[name](spark, "/root/testdata/sf0.01")
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        executed = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"\n## {name}\n\n`{summarize(executed)}`\n")
        out.append("```\n" + formatted.strip()[:6000] + "\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
