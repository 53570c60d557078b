"""Slowly-changing-dimension type 2 (versioned dimension history).

The reference's dims are SCD1 — `ON CONFLICT DO NOTHING` keeps one
attribute set per key forever (IowaLiquor-RDS.session.sql:94). The
warehouse-native extension is SCD2: when an incoming snapshot changes a
key's attributes, close the current row (valid_to = load date) and open a
new version. Implemented as pure joins/unions — no MERGE engine needed:

    changed  = incoming ⋈ current  WHERE attributes differ
    closed   = current rows for changed/removed keys, valid_to stamped
    opened   = changed + brand-new keys, valid_from stamped
    history  = untouched ∪ closed ∪ opened

At scale: partition the dimension by is_current so point-in-time queries
prune to the open slice, and run per load-date batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META = ["valid_from", "valid_to", "is_current"]


def scd2_init(snapshot: DataFrame, load_date: str) -> DataFrame:
    """First load: every row becomes an open version."""
    return snapshot.select(
        "*",
        F.lit(load_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(history: DataFrame, snapshot: DataFrame, key: str, load_date: str) -> DataFrame:
    """Merge a new full snapshot into an SCD2 history table.

    Attribute comparison is null-safe (``eqNullSafe``) across all non-key,
    non-meta columns. Keys absent from the snapshot are closed (deletes
    tracked as closed versions).
    """
    attrs = [c for c in snapshot.columns if c != key]
    cur = history.filter(F.col("is_current"))
    past = history.filter(~F.col("is_current"))

    snap = snapshot.alias("s")
    curr = cur.alias("c")
    joined = curr.join(snap, F.col(f"c.{key}") == F.col(f"s.{key}"), "full_outer")

    same = None
    for a in attrs:
        eq = F.col(f"c.{a}").eqNullSafe(F.col(f"s.{a}"))
        same = eq if same is None else (same & eq)

    in_both = F.col(f"c.{key}").isNotNull() & F.col(f"s.{key}").isNotNull()
    only_cur = F.col(f"s.{key}").isNull() & F.col(f"c.{key}").isNotNull()
    only_new = F.col(f"c.{key}").isNull() & F.col(f"s.{key}").isNotNull()

    unchanged = joined.filter(in_both & same).select("c.*")
    closed = (
        joined.filter((in_both & ~same) | only_cur)
        .select("c.*")
        .withColumn("valid_to", F.lit(load_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    opened = (
        joined.filter((in_both & ~same) | only_new)
        .select("s.*")
        .select(
            *[F.col(c) for c in snapshot.columns],
            F.lit(load_date).cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return past.unionByName(unchanged).unionByName(closed).unionByName(opened)


def as_of(history: DataFrame, date: str) -> DataFrame:
    """Point-in-time view: versions valid on ``date``."""
    d = F.lit(date).cast("date")
    return history.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    ).drop(*META)
