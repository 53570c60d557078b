"""insert_ignore / merge_upsert semantics (ON CONFLICT DO NOTHING / UPDATE)."""

from __future__ import annotations

from iowa_liquor_sales_spark.operators.upsert import insert_ignore, merge_upsert


def _tables(spark):
    target = spark.createDataFrame(
        [(1, "old-a"), (2, "old-b")], ["k", "v"]
    )
    incoming = spark.createDataFrame(
        [(2, "new-b"), (3, "new-c"), (3, "new-c2")], ["k", "v"]
    )
    return target, incoming


def test_insert_ignore_existing_wins(spark):
    target, incoming = _tables(spark)
    got = {
        (r["k"], r["v"])
        for r in insert_ignore(target, incoming, ["k"], order_cols=["v"]).collect()
    }
    # key 2 keeps old value; key 3 inserted once (deterministic winner).
    assert got == {(1, "old-a"), (2, "old-b"), (3, "new-c")}


def test_merge_upsert_incoming_wins(spark):
    target, incoming = _tables(spark)
    got = {
        (r["k"], r["v"])
        for r in merge_upsert(target, incoming, ["k"], order_cols=["v"]).collect()
    }
    assert got == {(1, "old-a"), (2, "new-b"), (3, "new-c")}


def test_insert_ignore_idempotent(spark):
    target, incoming = _tables(spark)
    once = insert_ignore(target, incoming, ["k"], order_cols=["v"])
    twice = insert_ignore(once, incoming, ["k"], order_cols=["v"])
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


def test_apply_cdc_semantics(spark):
    from iowa_liquor_sales_spark.operators.upsert import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "v"]
    )
    # key 1: updated twice, last wins; key 2: deleted; key 3: delete then
    # resurrect (higher seq wins); key 5: pure insert.
    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 10),
            (1, "a2", "U", 20),
            (2, "xx", "D", 10),
            (3, "c0", "D", 10),
            (3, "c2", "I", 20),
            (5, "e", "I", 10),
        ],
        ["k", "v", "op", "seq"],
    )
    out = {r["k"]: r["v"] for r in apply_cdc(snap, changes, ["k"], "seq").collect()}
    assert out == {1: "a2", 3: "c2", 4: "d", 5: "e"}


def test_merge_aggregate_delta_equals_recompute(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.upsert import (
        merge_aggregate_delta,
    )

    rows = [(i % 3, i, 100 + i) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "seq", "amt"])

    def rollup(d):
        return d.groupBy("k").agg(
            F.sum("amt").alias("amt"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )

    base = rollup(df.filter(F.col("seq") < 30))
    delta = rollup(df.filter(F.col("seq") >= 30))
    got = {
        r["k"]: (r["amt"], r["n_rows"])
        for r in merge_aggregate_delta(
            base, delta, ["k"], ["amt"]
        ).collect()
    }
    want = {
        r["k"]: (r["amt"], r["n_rows"]) for r in rollup(df).collect()
    }
    assert got == want


def test_merge_aggregate_delta_new_and_untouched_groups(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.upsert import (
        merge_aggregate_delta,
    )

    # A group only in base passes through; a group only in delta appears.
    base = spark.createDataFrame([(1, 10, 2), (2, 20, 1)],
                                 ["k", "amt", "n_rows"])
    delta = spark.createDataFrame([(2, 5, 1), (3, 7, 1)],
                                  ["k", "amt", "n_rows"])
    got = {
        r["k"]: (r["amt"], r["n_rows"])
        for r in merge_aggregate_delta(
            base, delta, ["k"], ["amt"]
        ).collect()
    }
    assert got == {1: (10, 2), 2: (25, 2), 3: (7, 1)}


def test_join_view_delta_bag_equivalence_with_duplicate_keys(spark):
    """old view + delta must equal the full recompute as a BAG —
    including duplicate join keys on both sides (multiplicities
    multiply through the join, the case set-EXCEPT gets wrong)."""
    from iowa_liquor_sales_spark.operators.upsert import join_view_delta

    base_l = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], ["k", "lv"]
    )
    delta_l = spark.createDataFrame([(1, "a3"), (3, "c")], ["k", "lv"])
    base_r = spark.createDataFrame(
        [(1, 10), (1, 11), (3, 30)], ["k", "rv"]
    )
    delta_r = spark.createDataFrame([(1, 12), (2, 20)], ["k", "rv"])

    old_view = base_l.join(base_r, ["k"])
    delta = join_view_delta(base_l, delta_l, base_r, delta_r, ["k"])
    full_new = base_l.unionByName(delta_l).join(
        base_r.unionByName(delta_r), ["k"]
    )

    def bag(df):
        return sorted(tuple(r) for r in df.collect())

    assert sorted(bag(old_view) + bag(delta)) == bag(full_new)
    assert bag(full_new) != bag(old_view)
