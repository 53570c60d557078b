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
