"""Plan-shape regression gate for the newest query surface: the physical
plans that make these operators scale must not silently regress (a lost
broadcast, an extra shuffle, or a dropped pushdown is a 100 TB bug even
when sf0.01 results stay correct)."""

from __future__ import annotations

import __spark_entry__ as m

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = m.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_analogs_broadcast_their_dims(spark):
    # Q14/Q16/Q20 shapes: the part/supplier dims must broadcast — a
    # SortMergeJoin against the fact side is the scale regression.
    for name in ("q_promo_revenue", "q_parts_supplier", "q_potential_promotion"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_forecast_revenue_pushes_filters_to_scan(spark):
    plan = _plan(spark, "q_forecast_revenue")
    assert "PushedFilters: [" in plan
    # at least the discount range must reach the parquet reader
    assert "l_discount" in plan.split("PushedFilters")[1].split("]")[0]


def test_chunk_documents_is_shuffle_free(spark):
    assert "Exchange" not in _plan(spark, "q_chunk_documents")


def test_hll_shuffles_only_registers(spark):
    # one partial->final aggregate pair around a single exchange
    plan = _plan(spark, "q_hll")
    assert plan.count("Exchange") <= 2  # register agg + single-row agg
    assert "SortMergeJoin" not in plan


def test_line_dedup_join_is_on_hash_not_text(spark):
    plan = _plan(spark, "q_line_dedup")
    assert "SortMergeJoin" not in plan or "lh" in plan


def test_zorder_has_no_join_and_partial_aggregates(spark):
    plan = _plan(spark, "q_zorder")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_simhash_pairs_candidates_join_is_equi(spark):
    # The banded pairing must be a hash equi-join on (band, block) —
    # a CartesianProduct or theta-join is the all-pairs regression.
    plan = _plan(spark, "q_simhash_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_cardinality_never_joins_the_inputs(spark):
    # The estimator joins two O(depth·width) sketches; any join keyed on
    # the raw orderkeys means the inputs were joined — the thing the
    # operator exists to avoid.
    plan = _plan(spark, "q_join_cardinality")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # counter tables aggregate map-side before their equi-join
    assert plan.count("HashAggregate") >= 4


def test_bitmap_distinct_is_two_level_aggregate(spark):
    # bitmap_construct_agg per (seg, bucket) then popcount-sum per seg —
    # no expand-based COUNT(DISTINCT) rewrite, no extra joins beyond the
    # broadcast dim.
    plan = _plan(spark, "q_bitmap_distinct")
    assert "Expand" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_grid_density_neighbor_join_is_equi(spark):
    plan = _plan(spark, "q_grid_density")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sorted_neighborhood_has_range_partitioning(spark):
    # The global order must come from a range exchange (distributed
    # sort), never a single-partition window.
    plan = _plan(spark, "q_sorted_neighborhood")
    assert "rangepartitioning" in plan.lower()


def test_lateral_topk_rewrites_to_hash_join(spark):
    # Catalyst must de-correlate the LATERAL limit into a join + window,
    # not a per-row nested loop over the full customer table.
    plan = _plan(spark, "q_lateral_topk")
    assert "CartesianProduct" not in plan


def test_interval_join_is_bucketed_equi_join(spark):
    # The overlap join must meet pairs through the (key, bucket) hash
    # equi-join — a CartesianProduct / nested-loop theta join is the
    # per-key quadratic regression the operator exists to avoid.
    plan = _plan(spark, "q_interval_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sparse_cosine_has_no_allpairs_join(spark):
    # Pairs may only meet through a shared term's posting list (word
    # equi-join); norms join back by doc id. No cross/theta joins, and
    # the df-cap's corpus count is a broadcast, not a shuffle of tf.
    plan = _plan(spark, "q_sparse_cosine")
    assert "CartesianProduct" not in plan
    # The only nested-loop join allowed is the 1-row n_docs broadcast
    # feeding the df cap (the printed tree repeats the reused subtree).
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "n_docs" in line, line
    assert "BroadcastExchange" in plan


def test_mst_boruvka_no_cartesian_anywhere(spark):
    # Two Boruvka rounds = a chain of equi-joins and windows; any
    # CartesianProduct means a label join degenerated.
    plan = _plan(spark, "q_mst_boruvka")
    assert "CartesianProduct" not in plan


def test_theta_diff_never_rescans_inputs(spark):
    # The A-NOT-B estimate runs on two O(k) sketches: the orders scans
    # feed ONLY the kmv passes (2 scans), and the join is sketch-vs-
    # sketch — any SortMergeJoin on o_custkey means an input rescan.
    plan = _plan(spark, "q_theta_diff")
    assert "SortMergeJoin" not in plan


def test_join_strategy_hints_respected(spark):
    # Hint surface: the optimizer must honor explicit per-join strategy
    # hints — the escape hatch when stats mislead AQE at 100 TB.
    from iowa_liquor_sales_spark.schemas import read_table

    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders")
    bhj = li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
    assert "BroadcastHashJoin" in bhj._jdf.queryExecution().executedPlan().toString()
    smj = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert "SortMergeJoin" in smj._jdf.queryExecution().executedPlan().toString()
    shj = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    assert "ShuffledHashJoin" in shj._jdf.queryExecution().executedPlan().toString()


def test_image_dhash_decodes_once_and_joins_equi(spark):
    # The Arrow decode must run ONCE (fingerprints persist across the
    # banded self-join — both sides read InMemoryRelation builds of the
    # same cache) and the candidate join must be a (band, block)
    # equi-join, never a CartesianProduct.
    plan = _plan(spark, "q_image_dhash")
    assert "CartesianProduct" not in plan
    # both self-join sides must read the persisted fingerprint cache
    # (the toString rendering re-prints the cached build plan — with its
    # MapInPandas — under EACH InMemoryTableScan, so count scans, not
    # MapInPandas nodes: two scans of one cache = one decode execution)
    assert plan.count("InMemoryTableScan") >= 2, "fingerprints not cached"


def test_ann_range_has_no_global_window_or_sort(spark):
    # Range search's point vs top-k: the threshold filter needs NO
    # global ranking of CANDIDATES — a Window/TakeOrdered over the
    # candidate relation would reintroduce the single-partition sort.
    # The only ordered operator allowed is the nprobe probe-cell pick
    # over the O(n_cells) centroid relation (TakeOrdered limit=nprobe).
    import re

    plan = _plan(spark, "q_ann_range")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    takes = re.findall(r"TakeOrderedAndProject\(limit=(\d+)", plan)
    assert all(int(lim) <= 16 for lim in takes), takes  # probe pick only
    # no candidate-ranking column anywhere (the probe window's prnk over
    # the O(n_cells) centroid relation is the one allowed ranking)
    assert not re.search(r"\brnk#", plan)


def test_token_budget_never_sorts_the_corpus(spark):
    # The two-phase rewrite's contract: no range-partitioned global
    # sort of the document relation — the only Exchanges are the
    # quality-level aggregate, the two tiny window relations, and the
    # boundary-level window partition.
    plan = _plan(spark, "q_token_budget")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning(q DESC" not in plan.replace(" ", "")


def test_ann_prebuilt_scan_is_dynamically_pruned(spark):
    # The whole point of the persisted index: the cell-PARTITIONED
    # assignments scan must carry a dynamic-partition-pruning subquery
    # on the broadcast probe cells (losing it = full index scan per
    # query, the 100 TB regression).
    plan = _plan(spark, "q_ann_prebuilt")
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters" in plan


def test_token_budget_boundary_is_range_partitioned(spark):
    # The boundary level's prefix sum must run through the distributed
    # ranker (range shuffle), not a 1-partition Window.partitionBy(q):
    # the modal-quality corpus makes that single task hold ~everything.
    plan = _plan(spark, "q_token_budget")
    assert "rangepartitioning" in plan.lower()


def test_spearman_global_has_no_row_level_window(spark):
    # Ranks come from distributed prefix sums over the O(distinct)
    # count relations; the only windows allowed partition by the range
    # partition id (_pid) — a window over raw rows (or one with no
    # partition spec) is the scale regression.
    plan = _plan(spark, "q_spearman_global")
    import re

    for spec in re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "_pid" in spec, spec


def test_rank_statistics_have_no_row_level_window(spark):
    # mann_whitney_u / ks_two_sample / gini_concentration: ranks and
    # cumulative counts come from distributed prefix sums over the
    # O(distinct) value relations; every Window must partition by the
    # range-partition id (_pid) — a window over raw rows (or with no
    # partition spec) is the single-task scale regression.
    import re

    for name in ("q_mann_whitney", "q_ks_drift", "q_gini_chars"):
        plan = _plan(spark, name)
        for spec in re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
            assert "_pid" in spec, (name, spec)


def test_interleave_has_no_per_source_window(spark):
    # interleave_by_source: positions come from ONE distributed global
    # rank over (source, hash, id) — a Window partitioned by source
    # would hand the modal source's full corpus to one task.
    plan = _plan(spark, "q_interleave_order")
    assert "Window" not in plan, plan
    assert "rangepartitioning" in plan.lower()


def test_chi2_broadcasts_its_marginals(spark):
    # chi2_independence: the row/column marginal joins against the
    # O(r*c) contingency relation must broadcast — a shuffle join for
    # O(r)+O(c) rows is pure overhead.
    plan = _plan(spark, "q_chi2_source_lang")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kruskal_has_no_row_level_window(spark):
    # Same contract as the two-sample tests: ranks from the distributed
    # prefix sum; every Window partitions by the range-partition id.
    import re

    plan = _plan(spark, "q_kruskal_wallis")
    for spec in re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "_pid" in spec, spec


def test_silhouette_broadcasts_centroids(spark):
    # The O(k*dims) centroid relation must broadcast against the
    # exploded point relation; a shuffle join there would move
    # points*dims rows twice.
    plan = _plan(spark, "q_silhouette")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dbscan_neighbor_join_is_equi_join(spark):
    # grid_dbscan's neighbor discovery must be an EQUI-join on the
    # eps-grid cell (3x3 neighborhood explode) — a nested-loop or
    # cartesian pair generation is the all-pairs scale regression the
    # grid blocking exists to prevent.
    plan = _plan(spark, "q_dbscan_grid")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ndcg_broadcasts_anchors(spark):
    # The O(n_queries) anchor relation must broadcast against the
    # corpus; shuffling the corpus for 8 anchors is pure overhead.
    plan = _plan(spark, "q_ndcg")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_jsd_grid_broadcasts_group_relation(spark):
    # The vocab x groups dense grid must come from broadcasting the
    # O(groups) relation onto the vocabulary — a SortMergeJoin there
    # shuffles the whole vocabulary per group.
    plan = _plan(spark, "q_jsd_drift")
    assert "SortMergeJoin" not in plan


def test_kendall_tau_counts_cell_pairs_not_row_pairs(spark):
    # kendall_tau_b's concordant/discordant mass must come from the
    # O(cells^2) contingency-cell quadrant sum (broadcast NL over the
    # tiny cell relation), with the row->cell collapse combined
    # map-side. A SortMergeJoin or CartesianProduct here means the
    # engine fell back to row pairs — O(n^2) at corpus scale.
    plan = _plan(spark, "q_kendall_tau")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan or "partial_count" in plan


def test_randomization_test_combines_replicates_map_side(spark):
    # The n_reps explode must collapse through a map-side-combinable
    # groupBy(rep) — the shuffle then carries O(n_reps) rows per task
    # instead of n_rows x n_reps exploded rows. partial_sum in the plan
    # IS that guarantee; losing it is the superlinear-tail mechanism
    # probed in SCALE.md.
    plan = _plan(spark, "q_randomization_test")
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_rolling_quantile_windows_stay_day_partitioned(spark):
    # rolling_grid_quantile must never sort raw events in a window: the
    # per-row aggregate collapses map-side to daily histograms first
    # (partial_sum), and every window that remains runs PARTITIONED BY
    # day over the O(days x buckets) grid — an empty partition spec
    # (global window) would serialize the whole relation through one
    # task at scale.
    plan = _plan(spark, "q_rolling_quantile")
    assert "partial_sum" in plan
    for frag in plan.split("windowspecdefinition(")[1:]:
        assert frag.split(",")[0].startswith("tday"), frag[:120]


def test_ams_f2_single_combinable_pass_no_smj(spark):
    # ams_f2 folds all nine +-1 estimators into ONE map-side-combinable
    # aggregate pass (partial_sum) and only ever joins O(1)-row
    # summary relations (broadcast NL) — a SortMergeJoin or a
    # CartesianProduct means an estimator fanned out into a per-row
    # join, O(n x estimators) shuffled rows at corpus scale.
    plan = _plan(spark, "q_ams_f2")
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_conformal_no_global_sort_of_residuals(spark):
    # conformal's calibration quantile must come from the windowed rank
    # over the O(calibration) residual relation with broadcast joins of
    # the O(1) threshold back onto the scoring side — SortMergeJoin /
    # CartesianProduct would shuffle the full relation per quantile.
    plan = _plan(spark, "q_conformal")
    assert "partial_sum" in plan or "partial_count" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rolling_anomaly_windows_stay_day_partitioned(spark):
    # rolling_anomaly collapses raw events to daily aggregates FIRST
    # (partial_sum) and every remaining value window runs PARTITIONED
    # BY the day grid — a global-window sort of raw rows serializes
    # the relation through one task at scale. (RowFrame specs and the
    # O(days)-relation rank window are fine; raw-grain empty
    # partition specs are not.)
    plan = _plan(spark, "q_rolling_anomaly")
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for frag in plan.split("windowspecdefinition(")[1:]:
        head = frag.split(",")[0]
        assert (
            head.startswith(("tday", "day", "ad#", "r#"))
            or head.startswith("specifiedwindowframe")
        ), frag[:120]
