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
