"""Deterministic (order-independent) floating aggregates.

Summing doubles in Spark is partition-order dependent; the same query can
hash differently run-to-run and will differ from a single-threaded oracle.
The engine's convention for money-like measures: cast each row to an exact
DECIMAL (the inputs are fixed-point values stored as doubles — see
FIXTURES.md), sum exactly in decimal (Spark's decimal sum is exact and
associative, so map-side partial aggregation still applies), then cast the
final scalar back to double. Bit-identical on any partitioning / any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, alias: str | None = None) -> Column:
    """Exact sum of a fixed-point-valued double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, scale: int = 2, alias: str | None = None) -> Column:
    """Deterministic mean: exact decimal sum divided (in double) by count."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB/ANSI rendering of the same exact-sum convention, used by the
    oracle layer so both engines compute identical bits."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
