#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Every query is forced end-to-end with the noop sink (full compute, no
collect-to-driver skew in the timing). The mix mirrors the reference's
measurable stages (BASELINE.md): silver-transform throughput (its 645k
rows/s pandas loop), CSV serialization (its COPY wire format), and the
analytical/star/dedup/similarity surface the engine adds.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from iowa_liquor_sales_spark import get_spark  # noqa: E402
from iowa_liquor_sales_spark.functions.cleansing import to_silver  # noqa: E402
from iowa_liquor_sales_spark.schemas import read_table  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

HEADLINE = [
    "q_scan_parquet",
    "q_groupby_agg",
    "q_star_join",
    "q_shipping_priority",
    "q_conditional_agg",
    "q_cube",
    "q_topk_pergroup",
    "q_window_running",
    "q_dedup_rank",
    "q_dedup_exact",
    "q_ngram_jaccard",
    "q_minhash_lsh",
    "q_simhash",
    "q_embed_neardup",
    "q_ann_bruteforce",
    "q_text_quality",
    "q_token_count",
    "q_fingerprint",
    "q_events_window",
    "q_sessionize",
    "q_multimodal_features",
    "q_regional_revenue",
    "q_decontaminate",
    "q_bloom_prefilter",
    "q_pagerank",
    "q_grid_quantiles",
    "q_heavy_hitters",
    "q_split_assign",
    "q_weighted_sample",
    "q_pack_sequences",
    "q_hll",
    "q_zorder",
    # round-2 flagship additions
    "q_global_rank",
    "q_ann_sq8",
    "q_cdc_apply",
    "q_session_native",
    "q_word_entropy",
    "q_bitmap_distinct",
    "q_join_cardinality",
    "q_hll_overlap",
    "q_weighted_median",
    "q_simhash_pairs",
    # round-3 flagship additions
    "q_theta_diff",
    "q_interval_merge",
    "q_naive_bayes",
    "q_order_priority",
    "q_sparse_cosine",
    "q_lm_score",
    "q_mst_boruvka",
    "q_interval_join",
    "q_substring_dedup",
    "q_adamic_adar",
    "q_interp_linear",
    "q_hll_sliding",
    "q_quantile_normalize",
    "q_embed_covariance",
    # round-4 additions: the two new heavier dataflows (vocab-join DSIR
    # weights; banded geo join + trig verify)
    "q_dsir_weights",
    "q_geo_radius_join",
    # round-5 additions: the PassJoin fuzzy self-match over the part-name
    # dictionary and the PQ train/encode/score pipeline
    "q_fuzzy_names",
    "q_ann_pq",
    # round-6 additions: the end-to-end ER flow (fuzzy match -> CC ->
    # survivorship, the heaviest new iterative dataflow) and the
    # multi-arm nprobe recall curve
    "q_entity_resolution",
    "q_ann_multiprobe",
    # round-7 additions: the image-dedup flow (Arrow decode -> dHash ->
    # banded Hamming join) and the IVF radius query
    "q_image_dhash",
    "q_ann_range",
    # round-8 additions: steady-state walls for the rest of the round-7
    # surface (regressions on new operators must be visible), plus the
    # prebuilt-ANN-index lifecycle queries
    "q_leakage_split",
    "q_token_budget",
    "q_canonical_dedup",
    "q_join_delta",
    "q_bh_fdr",
    "q_ann_prebuilt",
    "q_ann_assign_delta",
    "q_zipf_slope",
    "q_ngram_novelty",
    "q_spearman_global",
    # round-8 second batch: rank/drift statistics + interleave order
    "q_mann_whitney",
    "q_ks_drift",
    "q_chi2_source_lang",
    "q_gini_chars",
    "q_dup_rate_curve",
    "q_interleave_order",
    "q_kruskal_wallis",
    "q_anova_f",
    "q_levene",
    "q_silhouette",
    # round-8 third batch: readability/RAKE/JSD text analysis, Friedman,
    # NDCG retrieval eval, grid-blocked DBSCAN
    "q_readability",
    "q_rake_keywords",
    "q_jsd_drift",
    "q_friedman",
    "q_ndcg",
    "q_dbscan_grid",
    "q_t_closeness",
    # round-8 fourth batch: graph health metrics + classifier agreement
    "q_harmonic_centrality",
    "q_assortativity",
    "q_modularity",
    "q_cohens_kappa",
    "q_mcc",
    "q_theil_u",
    # round-8 fifth batch: drawdown/decay temporal ops, reliability,
    # and the composed dedup funnel (the heaviest new dataflow)
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
    # round-8 sixth batch: rank-correlation/effect-size/trend statistics,
    # OOF target encoding, randomization test, isotonic calibration, the
    # MAP/MRR retrieval eval, audio ZCR, and the Hurst R/S diagnostic
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
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def stage_stringly(spark, sf: str, path: str, n_parts: int = 32) -> None:
    """One-time staging of an all-string copy of lineitem — the wire-format
    input the reference's transform stage starts from (its raw parquet
    chunks hold CSV-parsed strings). Staged as ``n_parts`` files: the
    testdata ships one single-row-group parquet per table, which caps any
    scan of it at one task — the reference's own raw stage is 285 chunk
    files, so a multi-file staging ground is the faithful layout."""
    li = read_table(spark, sf, "lineitem").repartition(n_parts)
    li.select(
        F.col("l_orderkey").cast("string").alias("l_orderkey"),
        F.col("l_shipdate").cast("string").alias("date"),
        *[
            F.col(c).cast("string").alias(c)
            for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ],
    ).write.mode("overwrite").parquet(path)


def q_silver_transform(spark, staged_path: str):
    """Reference transform-stage analog (BASELINE: ~645k rows/s in a serial
    pandas loop): read staged strings, coerce timestamp + 4 numerics,
    null-fill — the same work as src/transform.py:11-23."""
    return to_silver(
        spark.read.parquet(staged_path),
        ts_cols=("date",),
        int_cols=(),
        num_cols=("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="iowa-engine-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # The bench runs 60+ distinct queries (x2, best-of-2) in ONE
            # JVM; each whole-stage-codegen class lands in the JIT code
            # cache, and the JVM's default ReservedCodeCacheSize (240m)
            # can fill late in the run — compilation then stops and
            # later queries run interpreted, which is the only mechanism
            # consistent with q_session_native's monotone r2->r4 drift
            # (0.55 -> 1.11s at a FIXED list position while the list
            # grew 45 -> 61; isolated reruns measure 0.54s steady-state
            # on identical code). Only effective when this builder
            # launches the JVM — which is the bench's normal mode.
            "spark.driver.extraJavaOptions": (
                "-XX:ReservedCodeCacheSize=512m"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    timings: dict[str, float] = {}

    # Warm the JVM/session on the smallest scale so first-query JIT/codegen
    # cost doesn't land on an arbitrary headline query.
    _force(entry_mod.entry(spark))

    # Warehouse ingest, timed as its own entry: the testdata ships ONE
    # single-row-group parquet file per table, which caps every scan of it
    # at one task no matter how many cores (or executors) exist. No engine
    # would serve queries off that layout at scale — the reference itself
    # stages 285 chunk files. Pay the re-layout cost once, honestly, then
    # run every query against the splittable copy. Dims stay single-file
    # (they broadcast); fact-sized tables get one file per core.
    wh = tempfile.mkdtemp(prefix="bench_wh_")
    n = int(cpus)

    def _ingest(tbl: str, parts: int) -> None:
        read_table(spark, sf_dir, tbl).repartition(parts).write.mode(
            "overwrite"
        ).parquet(f"{wh}/{tbl}.parquet")

    # Concurrent scheduler jobs: each source file is one unsplittable row
    # group (a 1-task read), so serial ingest would idle 31 cores per
    # table. Thread-submitted writes overlap those single-task scans —
    # same trick a cluster ingest job uses for many small inputs.
    from concurrent.futures import ThreadPoolExecutor

    layout = [
        ("lineitem", n),
        ("orders", n),
        ("events", n),
        # documents/embeddings stay few-file: the explode-heavy operators
        # repartition to core count themselves (_ensure_parallelism) and
        # the matmul path re-shuffles into blocks, so per-core source
        # files only add scan-task overhead.
        ("customer", 4),
        ("documents", 4),
        ("embeddings", 4),
        ("part", 1),
        ("supplier", 1),
        ("nation", 1),
        ("region", 1),
    ]
    # Best-of-2, same protocol as the queries below: the single-shot r2
    # number swung 2.5 s -> 4.75 s with byte-identical code on a busy
    # JVM; overwrite mode makes the second pass identical work.
    ingest_best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=len(layout)) as pool:
            list(pool.map(lambda tp: _ingest(*tp), layout))
        ingest_best = min(ingest_best, time.perf_counter() - t0)
    timings["q_warehouse_ingest"] = round(ingest_best, 3)

    def timed(name, mk) -> None:
        # Best-of-2, cache cleared before each run: single-shot walls in
        # one busy JVM swing ±1s from GC/JIT/codegen (measured ±3s on the
        # 37-query total); the min is the repeatable cost and the same
        # protocol scripts/scale_probe.py documents. clearCache keeps
        # each run self-contained — operators that persist intermediates
        # (minhash/jaccard/matmul blocks) don't serve the second run
        # from memory, and don't evict-churn later queries.
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _force(mk())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    for name in HEADLINE:
        timed(name, lambda name=name: queries[name](spark, wh))

    # Attribute q_ann_pq's wall between the Lloyd codebook TRAIN (a
    # one-off in production — indexes train offline and are reused) and
    # the per-query ADC scoring. Timed separately, reported under
    # "stage_splits" so the headline total stays comparable round to
    # round; adc_sec is the remainder of the q_ann_pq entry.
    from iowa_liquor_sales_spark.operators.similarity import _pq_train_encode

    emb = read_table(spark, wh, "embeddings")
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _pq_train_encode(emb, 8, 4, 1, 64, "vec_id", "embedding")
        best = min(best, time.perf_counter() - t0)
    pq_train = round(best, 3)
    stage_splits = {
        "q_ann_pq_train": pq_train,
        "q_ann_pq_adc": round(max(timings.get("q_ann_pq", 0.0) - pq_train, 0.0), 3),
    }

    # The prebuilt-index lifecycle split: q_ann_prebuilt's headline wall
    # includes the one-off index BUILD (train + cell-partitioned write)
    # because the oracle-checked query is self-contained; production
    # builds once and pays only the query side. Time them separately:
    # build once, then the pure index-backed query (which also reads
    # fewer partitions than the in-query-trained q_ann_ivf scan).
    from iowa_liquor_sales_spark.operators.similarity import (
        build_ann_index,
        ivf_topk,
        load_ann_index,
    )

    idx_path = tempfile.mkdtemp(prefix="bench_annidx_") + "/ann"
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build_ann_index(emb, idx_path, n_cells=16)
        best = min(best, time.perf_counter() - t0)
    stage_splits["q_ann_prebuilt_build"] = round(best, 3)
    idx = load_ann_index(spark, idx_path)
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _force(
            ivf_topk(emb, query_id=7, k=10, nprobe=2, index=idx).select(
                "vec_id", "rnk"
            )
        )
        best = min(best, time.perf_counter() - t0)
    stage_splits["q_ann_prebuilt_query"] = round(best, 3)

    staged = tempfile.mkdtemp(prefix="bench_stringly_") + "/lineitem_str"
    stage_stringly(spark, wh, staged, n_parts=int(cpus))
    timed("q_silver_transform", lambda: q_silver_transform(spark, staged))

    # Reference load-stage analog (BASELINE: 19k rows/s in-memory CSV +
    # COPY FROM STDIN): serialize lineitem to the same CSV wire format
    # (no header, NULLs as \N). A JDBC sink would add network/DB time the
    # offline container can't reproduce; the Spark-side cost IS this
    # partition-parallel serialization.
    # COPY-wire serialization is embarrassingly parallel and runs one task
    # per core (the cluster-shaped plan), not one writer thread. Real file
    # write (not noop) — best-of-2 like the rest.
    csv_dest = tempfile.mkdtemp(prefix="bench_csvload_") + "/lineitem_csv"
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        read_table(spark, wh, "lineitem").write.mode("overwrite").option(
            "nullValue", "\\N"
        ).option("header", "false").csv(csv_dest)
        best = min(best, time.perf_counter() - t0)
    timings["q_csv_load"] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "stage_splits": stage_splits,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
