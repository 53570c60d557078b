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
from pyspark.sql import functions as F

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


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture stream to a snapshot: ``changes`` rows
    carry an op ('I'/'U'/'D'), a monotonically ordered ``seq_col``, and
    the full row payload. Per key, the highest-seq change wins; a final
    'D' deletes the key, 'I'/'U' replace (or insert) the row. Snapshot
    rows with no change pass through untouched.

    Plan shape: one window (partition by key, order by seq desc) reduces
    the change stream to its per-key head — shuffle bounded by the CHANGE
    volume, not the snapshot; the snapshot joins that compact head with
    a single anti-join + union. This is the MERGE-from-changelog pattern
    a lakehouse table format runs on every commit.

    Ties on ``seq_col`` break deterministically by op descending
    ('U' > 'I' > 'D' lexically — document your CDC source's real
    tie-break and pass a unique seq when it matters).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    head = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = head.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    untouched = snapshot.join(head.select(*keys), keys, "left_anti")
    return untouched.unionByName(survivors)


def merge_aggregate_delta(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental materialized-view maintenance for distributive
    aggregates (SUM/COUNT): fold a pre-aggregated DELTA batch into the
    existing BASE aggregate without touching base facts — the
    refresh-a-rollup-from-CDC pattern. Works because SUM/COUNT are
    commutative monoids: ``agg(base facts ∪ delta facts) =
    merge(agg(base), agg(delta))``.

    One union + one map-side-combinable re-aggregate over O(groups)
    rows — the whole point: cost scales with the DELTA and the group
    count, never with base-table volume. (MIN/MAX merge the same way;
    AVG must be carried as SUM+COUNT pairs, which is why the contract
    takes integer-scaled sums, not means.)
    """
    cols = keys + sum_cols + [count_col]
    merged = base.select(*cols).unionAll(delta.select(*cols))
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.sum(count_col).cast("long").alias(count_col),
    )


def join_view_delta(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental materialized-view maintenance for an inner JOIN view
    (the classic delta rule of incremental view maintenance,
    Gupta & Mumick's counting-free insert-only form):

        Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

    given insert-only deltas, the view's new rows are exactly the three
    disjoint terms — old-left with new-right, new-left with old-right,
    and new-with-new. Appending the result to the stored view equals a
    full recompute of ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` without ever re-joining
    the two BASE tables — the term a 100 TB view refresh cannot afford.
    (Deletes/updates need the counting algorithm on top; the engine's
    CDC path composes :func:`apply_cdc` before this for last-write-wins
    feeds.)

    Cost shape: two delta⋈base joins (each shuffles the DELTA fully but
    the base only on the join key — broadcast the delta when it is
    small) plus one delta⋈delta join; nothing scans base⋈base.
    """
    return (
        delta_left.join(base_right, on)
        .unionByName(base_left.join(delta_right, on))
        .unionByName(delta_left.join(delta_right, on))
    )
