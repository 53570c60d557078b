"""Idempotent key-level upsert — the reference's ``INSERT ... ON CONFLICT
(pk) DO NOTHING`` into an *existing* table (IowaLiquor-RDS.session.sql:94
etc.), which ``dropDuplicates`` alone cannot express (SURVEY §4: needs an
anti-join against the target or a MERGE).

``insert_ignore`` is the DO NOTHING semantics (existing rows win);
``merge_upsert`` is the DO UPDATE variant (incoming rows win). Both are one
broadcast-or-shuffle anti-join plus a union — at warehouse scale run them
per partition-pruned slice (e.g. per day) so the rewrite touches only the
affected partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from iowa_liquor_sales_spark.operators.dedup import dedup_rank


def insert_ignore(
    target: DataFrame, incoming: DataFrame, keys: list[str], order_cols: list | None = None
) -> DataFrame:
    """Existing rows win; new keys are inserted (deduplicated
    deterministically when ``order_cols`` given, else first-wins)."""
    fresh = incoming.join(target.select(*keys), keys, "left_anti")
    fresh = (
        dedup_rank(fresh, keys, order_cols)
        if order_cols
        else fresh.dropDuplicates(keys)
    )
    return target.unionByName(fresh)


def merge_upsert(
    target: DataFrame, incoming: DataFrame, keys: list[str], order_cols: list | None = None
) -> DataFrame:
    """Incoming rows win (ON CONFLICT DO UPDATE): keep target rows whose
    key is absent from incoming, then add the (deduplicated) incoming."""
    inc = (
        dedup_rank(incoming, keys, order_cols)
        if order_cols
        else incoming.dropDuplicates(keys)
    )
    kept = target.join(inc.select(*keys), keys, "left_anti")
    return kept.unionByName(inc)
